from ai_pdf_extraction_spark.corpus.generate import generate_pages, write_pages_parquet

__all__ = ["generate_pages", "write_pages_parquet"]
