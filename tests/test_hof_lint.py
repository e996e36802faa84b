"""The multi-consumer-HOF rule as a LINT (the r13 verdict's ask #5 —
the trap cost three rounds: t41, winnowing, t39/t40): any
``F.transform``/``F.filter``-derived array consumed by more than one
output column must be staged as a bound column, because Spark's
interpreted HOF path does no common-subexpression reuse. The lint
(tools/hof_lint.py) runs here against a seeded violation, against the
staged idiom (must pass), and against the operators the optimization
history already staged (must stay staged)."""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))
from hof_lint import lint_source  # noqa: E402

SEEDED_VIOLATION = """
def bad_profile(docs):
    words = F.filter(F.split(F.col("text"), r"\\s+"), lambda w: F.length(w) > 0)
    return docs.select(
        F.size(words).alias("n_words"),
        F.size(F.filter(words, lambda w: w == F.lit("x"))).alias("n_x"),
    )
"""

STAGED_IDIOM = """
def good_profile(docs):
    words_e = F.filter(F.split(F.col("text"), r"\\s+"), lambda w: F.length(w) > 0)
    base = docs.select(words_e.alias("_words"))
    words = F.col("_words")
    return base.select(
        F.size(words).alias("n_words"),
        F.size(F.filter(words, lambda w: w == F.lit("x"))).alias("n_x"),
    )
"""

TAINT_PROPAGATES = """
def chained(docs):
    mask = F.transform(
        F.col("xs"),
        lambda x, i: F.exists(F.slice(F.col("xs"), F.lit(1), i), lambda y: y == x),
    )
    pairs = F.arrays_zip(F.col("xs"), mask)
    return docs.select(
        F.size(pairs).alias("a"),
        F.size(F.filter(pairs, lambda p: p["mask"])).alias("b"),
    )
"""


def test_lint_catches_the_seeded_violation():
    found = lint_source(SEEDED_VIOLATION)
    assert any(f["var"] == "words" and f["n_uses"] == 2 for f in found)


def test_lint_passes_the_staged_idiom():
    # the staging select is exactly ONE read of the derived expr;
    # downstream consumers read the bound F.col, which is never tainted
    assert lint_source(STAGED_IDIOM) == []


def test_taint_propagates_through_derived_locals():
    # `pairs` is built FROM the HOF-derived mask: consuming pairs twice
    # re-derives mask twice — the t40 shape
    found = lint_source(TAINT_PROPAGATES)
    assert any(f["var"] == "pairs" for f in found)


def test_optimized_operators_stay_staged():
    """The three operators the optimization history staged must stay
    clean under the lint — a regression here re-opens a measured 2-6x
    cost (winnowing fused+staged at r14 start, t39 staged at r14
    start, t41 staged at r12)."""
    import ast
    import inspect

    from datacatalog_tag_engine_spark.pipeline import text as TXT

    for fn in (TXT.winnowing_fingerprints, TXT.line_language_profile):
        src = inspect.getsource(fn)
        tree = ast.parse(src)
        from hof_lint import lint_function

        found = lint_function(tree.body[0], fn.__name__)
        assert found == [], f"{fn.__name__} regressed the staging rule: {found}"


def test_r15_bank_drafts_are_lint_clean():
    """New draft code must enter the bank staged — the lint gates the
    NEXT rotation's operators at proof time, before pricing."""
    bank = os.path.join(ROOT, "tests", "test_oracle_drafts_r15.py")
    if not os.path.exists(bank):
        return  # the bank is written later in the round
    found = [
        f
        for f in lint_source(open(bank).read(), bank)
        if not f["func"].startswith("test_")
    ]
    assert found == [], f"unstaged HOF consumers in the r15 bank: {found}"
