"""Query inventory: every operator from SURVEY.md §2 (+ north-star
extensions) expressed as a named, oracle-checked query.

Importing this package registers all queries into ``registry.ALL``.
"""

from hudi_and_delta_showcase_spark.queries import registry


def load_all() -> dict[str, "registry.Query"]:
    # Imports are for registration side effects.
    from hudi_and_delta_showcase_spark.queries import (  # noqa: F401
        cdc_queries,
        extensions,
        relational,
        streaming_queries,
    )

    return registry.ALL
