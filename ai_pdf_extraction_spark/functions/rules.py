"""Validation-rule compiler: rule string → Catalyst Column (SURVEY.md §2.7 F8).

The reference evaluates rules like
``summary_gross_worth == summary_net_worth + summary_vat`` per
document with ``simpleeval`` (``services/ai/validation.py:157-241``):
split on ``==``, evaluate both sides against the document's numeric
field values with a small function allowlist, compare within tolerance
``max(1%·lhs, 1%·rhs, 0.02)`` (``validation.py:229-241``).

Here the rule compiles ONCE at plan time into a Column expression, so
evaluation is whole-stage-codegen'd across all rows — no per-row
Python interpreter (the plan-time analogue of SURVEY.md §2.2 P8's
identifier sanity check happens during compilation).
"""

from __future__ import annotations

import ast

from pyspark.sql import Column
from pyspark.sql import functions as F

# Allowlist mirrors the reference's simpleeval function table
# (``validation.py:193-206``): sum/round/abs/min/max/sqrt/log/log10/pow/len.
_TOLERANCE_ABS = 0.02
_TOLERANCE_REL = 0.01


class RuleCompileError(ValueError):
    pass


def _require_arity(name: str, args: list, lo: int, hi: int | None = None) -> None:
    hi = lo if hi is None else hi
    if not (lo <= len(args) <= hi):
        want = str(lo) if lo == hi else f"{lo}-{hi}"
        raise RuleCompileError(f"{name}() takes {want} argument(s), got {len(args)}")


def _compile_call(node: ast.Call, fields: dict[str, Column]) -> Column:
    if not isinstance(node.func, ast.Name):
        raise RuleCompileError("only plain function calls allowed")
    if node.keywords:
        # silently dropping kwargs would compile a DIFFERENT expression
        # than the rule author wrote (e.g. round(a, ndigits=2) → round(a, 0))
        raise RuleCompileError("keyword arguments are not allowed in rules")
    name = node.func.id
    args = [_compile_expr(a, fields) for a in node.args]
    if name == "sum":
        _require_arity(name, args, 1)
        return F.aggregate(
            args[0], F.lit(0.0), lambda acc, x: acc + x.try_cast("double")
        )
    if name == "len":
        _require_arity(name, args, 1)
        return F.size(args[0]).cast("double")
    if name == "round":
        if len(args) == 1:
            return F.round(args[0], 0)
        if len(args) == 2 and isinstance(node.args[1], ast.Constant):
            return F.round(args[0], int(node.args[1].value))
        raise RuleCompileError("round() precision must be a literal int")
    if name == "abs":
        _require_arity(name, args, 1)
        return F.abs(args[0])
    if name == "min":
        _require_arity(name, args, 2, 99)
        return F.least(*args)
    if name == "max":
        _require_arity(name, args, 2, 99)
        return F.greatest(*args)
    if name == "sqrt":
        _require_arity(name, args, 1)
        return F.sqrt(args[0])
    if name == "log":
        _require_arity(name, args, 1)
        return F.log(args[0])
    if name == "log10":
        _require_arity(name, args, 1)
        return F.log10(args[0])
    if name == "pow":
        _require_arity(name, args, 2)
        return F.pow(args[0], args[1])
    raise RuleCompileError(f"function '{name}' not in allowlist")


def _compile_expr(node: ast.AST, fields: dict[str, Column]) -> Column:
    if isinstance(node, ast.Expression):
        return _compile_expr(node.body, fields)
    if isinstance(node, ast.Num):  # pragma: no cover - py<3.8 compat path
        return F.lit(float(node.n))
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float)):
            return F.lit(float(node.value))
        raise RuleCompileError(f"literal {node.value!r} not numeric")
    if isinstance(node, ast.Name):
        if node.id not in fields:
            raise RuleCompileError(f"unknown field '{node.id}'")
        return fields[node.id]
    if isinstance(node, ast.BinOp):
        left = _compile_expr(node.left, fields)
        right = _compile_expr(node.right, fields)
        if isinstance(node.op, ast.Add):
            return left + right
        if isinstance(node.op, ast.Sub):
            return left - right
        if isinstance(node.op, ast.Mult):
            return left * right
        if isinstance(node.op, ast.Div):
            # ANSI mode: plain '/' raises DIVIDE_BY_ZERO and kills the
            # job; try_divide yields null → the rule is skipped for
            # that row, matching the reference's per-document
            # exception handling
            return F.try_divide(left, right)
        if isinstance(node.op, ast.Pow):
            return F.pow(left, right)
        raise RuleCompileError(f"operator {type(node.op).__name__} not allowed")
    if isinstance(node, ast.UnaryOp):
        operand = _compile_expr(node.operand, fields)
        if isinstance(node.op, ast.USub):
            return -operand
        if isinstance(node.op, ast.UAdd):
            return operand
        raise RuleCompileError("unary operator not allowed")
    if isinstance(node, ast.Call):
        return _compile_call(node, fields)
    raise RuleCompileError(f"node {type(node).__name__} not allowed")


def compile_side(expr: str, fields: dict[str, Column]) -> Column:
    """Compile one side of a rule into a double-typed Column."""
    try:
        tree = ast.parse(expr.strip(), mode="eval")
    except SyntaxError as exc:
        raise RuleCompileError(f"cannot parse '{expr}': {exc}") from exc
    # try_cast: a rule touching a non-numeric string column must yield
    # null (rule skipped for that row), not an ANSI cast crash
    return _compile_expr(tree, fields).try_cast("double")


def compile_rule(rule: str, fields: dict[str, Column]) -> Column:
    """Compile ``lhs == rhs`` into a boolean Column with the
    reference's tolerance ``max(1%·|lhs|, 1%·|rhs|, 0.02)``
    (``validation.py:229-241``). Null on either side → null (the
    reference skips rules with missing operands,
    ``tests/test_ai_service.py:280-296``)."""
    if "==" not in rule:
        raise RuleCompileError("rule must contain '=='")
    lhs_s, rhs_s = rule.split("==", 1)
    lhs = compile_side(lhs_s, fields)
    rhs = compile_side(rhs_s, fields)
    tol = F.greatest(
        F.abs(lhs) * F.lit(_TOLERANCE_REL),
        F.abs(rhs) * F.lit(_TOLERANCE_REL),
        F.lit(_TOLERANCE_ABS),
    )
    return F.when(lhs.isNull() | rhs.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.abs(lhs - rhs) <= tol
    )


def rule_fields(rule: str) -> set[str]:
    """Identifiers referenced by a rule (plan-time sanity check — the
    reference's regex-minus-keywords extraction,
    ``validation.py:288-342``)."""
    names: set[str] = set()
    callees: set[str] = set()
    for side in rule.split("=="):
        try:
            tree = ast.parse(side.strip(), mode="eval")
        except SyntaxError as exc:
            # swallowing this returned a partial/empty set, letting an
            # unparseable rule sail through the subset guard and crash
            # at compile time instead of being skipped
            raise RuleCompileError(f"cannot parse '{side.strip()}': {exc}") from exc
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                names.add(node.id)
            elif isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
                callees.add(node.func.id)
    return names - callees
