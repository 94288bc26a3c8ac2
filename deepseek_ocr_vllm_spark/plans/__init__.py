"""Query plans: the SURVEY.md §2 operator inventory expressed as
DataFrame plans with DuckDB oracle SQL for the driver's correctness gate.

Importing this package populates REGISTRY from every query module."""

from . import queries as _q  # noqa: F401
from . import queries_clean as _qc  # noqa: F401
from . import queries_ml as _qml  # noqa: F401
from . import queries_stream as _qs  # noqa: F401
from . import queries_text as _qt  # noqa: F401
from .queries import REGISTRY, TABLES  # noqa: F401

# The driver's correctness gate records the first 50 enumerated queries.
# The registry is kept at EXACTLY 50 (VERDICT r4 #6) so nothing ever sits
# in an unrecorded overflow slot: x7_ner_label_counts (a derivative view of
# x7_ner_spans — same extractor, weaker oracle) moved to a pytest
# (tests/test_ner_guardrails.py) that runs the identical DuckDB comparison.
# Any future registration past 50 trips this assert instead of silently
# evicting an operator from the driver's recorded window.
# a real raise, not `assert` — asserts vanish under python -O and this
# guard must survive any deployment (review r5)
if len(REGISTRY) > 50:
    raise RuntimeError(
        f"REGISTRY has {len(REGISTRY)} entries; the driver gate records "
        "only the first 50 — fold derivative views into pytest instead"
    )
