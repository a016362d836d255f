"""Large-scale data-pipeline operators (dedup, similarity, text, graph,
multimodal, as-of / range joins). Import the submodules directly:

    from knetminer_etl_spark.operators import dedup, similarity, graph
"""

from . import (  # noqa: F401 - re-exported for discoverability
    asof,
    dedup,
    graph,
    multimodal,
    rangejoin,
    similarity,
    text,
    util,
)
