from ai_pdf_extraction_spark.oracle.run_reference import (
    extract_rows,
    write_golden_parquet,
)

__all__ = ["extract_rows", "write_golden_parquet"]
