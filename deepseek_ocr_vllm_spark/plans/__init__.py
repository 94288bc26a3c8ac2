"""Query plans: the SURVEY.md §2 operator inventory expressed as
DataFrame plans with DuckDB oracle SQL for the driver's correctness gate.

Importing this package populates REGISTRY from every query module."""

from . import queries as _q  # noqa: F401
from . import queries_clean as _qc  # noqa: F401
from . import queries_ml as _qml  # noqa: F401
from . import queries_stream as _qs  # noqa: F401
from . import queries_text as _qt  # noqa: F401
from .queries import REGISTRY, TABLES  # noqa: F401
