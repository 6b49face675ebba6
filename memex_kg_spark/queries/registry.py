"""Central query registry: every operator exposed to the driver.

Keys with an oracle_sql twin get the full row-count + schema + value-hash
check against DuckDB at sf0.01; keys without one (iterative / genuinely
non-SQL ops) get the weaker rows-only check.
"""

from __future__ import annotations

from .kg import kg_oracle_sql, kg_queries
from .relational import relational_oracle_sql, relational_queries


def all_queries() -> dict:
    out: dict = {}
    out.update(kg_queries())
    out.update(relational_queries())
    try:
        from .vector import vector_oracle_sql, vector_queries  # noqa: F401
        out.update(vector_queries())
    except ImportError:
        pass
    try:
        from .textq import text_oracle_sql, text_queries  # noqa: F401
        out.update(text_queries())
    except ImportError:
        pass
    try:
        from .graphq import graph_oracle_sql, graph_queries  # noqa: F401
        out.update(graph_queries())
    except ImportError:
        pass
    try:
        from .extra import extra_oracle_sql, extra_queries  # noqa: F401
        out.update(extra_queries())
    except ImportError:
        pass
    return out


def all_oracle_sql() -> dict:
    out: dict = {}
    out.update(kg_oracle_sql())
    out.update(relational_oracle_sql())
    try:
        from .vector import vector_oracle_sql
        out.update(vector_oracle_sql())
    except ImportError:
        pass
    try:
        from .textq import text_oracle_sql
        out.update(text_oracle_sql())
    except ImportError:
        pass
    try:
        from .graphq import graph_oracle_sql
        out.update(graph_oracle_sql())
    except ImportError:
        pass
    try:
        from .extra import extra_oracle_sql
        out.update(extra_oracle_sql())
    except ImportError:
        pass
    return out
