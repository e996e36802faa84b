"""Static lint for the thrice-learned multi-consumer-HOF rule (t41 at
r12, winnowing at r12, t39/t40 at r13): Spark's interpreted
higher-order-function path does no common-subexpression reuse, so a
``Column`` built from ``F.transform``/``F.filter``/``F.aggregate``/
``F.zip_with``/``F.arrays_zip`` that is CONSUMED by more than one
output expression is re-derived per consumer — O(consumers) scans of
the array math, and O(n^2)-per-document when the re-derived lambda is
itself per-element. The fix is always the same: stage the derived
array as a bound column (``df.select(expr.alias("_x"))``) and have
every consumer read ``F.col("_x")``.

Scope (deliberately conservative, tuned so the certified staged
operators pass and the three historical bugs fail):
- a local is TAINTED when its RHS contains an HOF-builder call that is
  EXPENSIVE to re-derive — its source (first argument) is an
  expression rather than a bound column/plain name, or its lambda
  contains another collection-scan call — or when its RHS references
  an already-tainted local (taint propagates through derived locals);
- assignments whose RHS is a DataFrame method chain (``docs.select(
  ...)``) are never tainted: that IS the staging idiom;
- a tainted local read more than once (occurrences, not statements) is
  flagged; staging is exactly one read;
- only top-of-scope function locals are linted: a nested def used as a
  per-element classifier pays its internal re-derivation per ELEMENT,
  a regime the measured history accepts — but its closure reads of
  outer tainted locals still count.

Usage:
  python tools/hof_lint.py FILE [FILE ...]      # exit 1 on findings
  from hof_lint import lint_source              # programmatic (drafts tests)
"""

from __future__ import annotations

import ast
import sys

HOF_BUILDERS = {"transform", "filter", "aggregate", "zip_with", "arrays_zip"}
# calls inside an HOF lambda that make per-element work itself a scan
INNER_SCANS = HOF_BUILDERS | {"exists", "forall"}


def _is_f_call(node: ast.AST, names: set[str]) -> bool:
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr in names
        and isinstance(node.func.value, ast.Name)
        and node.func.value.id == "F"
    )


def _expensive_hof(node: ast.AST) -> bool:
    """True if the expression contains an HOF-builder call whose
    re-derivation is non-trivial: source argument is an expression
    (F.split(...), F.sequence(...), another HOF) rather than a bound
    column (F.col(...)) or a plain name, OR whose lambda body contains
    another collection scan."""
    for sub in ast.walk(node):
        if not _is_f_call(sub, HOF_BUILDERS):
            continue
        src = sub.args[0] if sub.args else None
        src_bound = isinstance(src, ast.Name) or _is_f_call(src, {"col"})
        if not src_bound:
            return True
        for arg in sub.args[1:]:
            for inner in ast.walk(arg):
                if _is_f_call(inner, INNER_SCANS):
                    return True
    return False


def _is_dataframe_chain(node: ast.AST) -> bool:
    """RHS like ``docs.select(...)`` / ``base.withColumn(...)`` — a
    method call whose ultimate base is not the functions module ``F``.
    These produce DataFrames (the staging idiom), not Column exprs."""
    while isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
        node = node.func.value
    return isinstance(node, ast.Name) and node.id != "F"


def _reads(node: ast.AST) -> list[str]:
    return [
        sub.id
        for sub in ast.walk(node)
        if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load)
    ]


def lint_function(fn: ast.FunctionDef, path: str = "<src>") -> list[dict]:
    """One taint-and-count pass over ``fn``'s top-of-scope body."""
    findings: list[dict] = []
    tainted: dict[str, int] = {}  # var -> assignment line
    uses: dict[str, int] = {}

    def count_reads(node: ast.AST) -> None:
        for name in _reads(node):
            if name in uses:
                uses[name] += 1

    for stmt in fn.body:
        if isinstance(stmt, ast.Assign):
            # RHS reads count first (x = F.transform(x, ...) reads old x)
            count_reads(stmt.value)
            is_tainted = not _is_dataframe_chain(stmt.value) and (
                _expensive_hof(stmt.value)
                or bool(set(_reads(stmt.value)) & set(tainted))
            )
            for t in stmt.targets:
                if isinstance(t, ast.Name):
                    if is_tainted:
                        tainted[t.id] = stmt.lineno
                        uses[t.id] = 0
                    else:
                        # rebinding to a clean expr (e.g. F.col) clears
                        tainted.pop(t.id, None)
                        uses.pop(t.id, None)
        else:
            # nested defs, loops, returns: closure/body reads count
            count_reads(stmt)

    for var, line in tainted.items():
        if uses.get(var, 0) > 1:
            findings.append(
                {"file": path, "func": fn.name, "line": line, "var": var,
                 "n_uses": uses[var]}
            )
    return findings


def lint_source(src: str, path: str = "<src>") -> list[dict]:
    """Lint every module- and class-level function (nested defs are
    per-element classifiers — see the scope note in the docstring)."""
    tree = ast.parse(src)

    def top_funcs(body):
        for n in body:
            if isinstance(n, ast.FunctionDef):
                yield n
            elif isinstance(n, ast.ClassDef):
                yield from top_funcs(n.body)

    findings: list[dict] = []
    for fn in top_funcs(tree.body):
        findings.extend(lint_function(fn, path))
    return findings


def main() -> None:
    total = []
    for path in sys.argv[1:]:
        total.extend(lint_source(open(path).read(), path))
    for f in total:
        print(
            f"{f['file']}:{f['line']}: in {f['func']}(): HOF-derived "
            f"`{f['var']}` consumed {f['n_uses']}x — stage it as a bound "
            f"column (no CSE on the interpreted HOF path)"
        )
    if total:
        sys.exit(1)
    print("hof_lint: clean")


if __name__ == "__main__":
    main()
