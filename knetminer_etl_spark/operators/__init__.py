"""Large-scale data-pipeline operators (dedup, similarity, text, graph,
multimodal, as-of / range joins). Import the submodules directly:

    from knetminer_etl_spark.operators import dedup, similarity, graph
"""

from . import (  # noqa: F401 - re-exported for discoverability
    asof,
    bloomjoin,
    bpe,
    cdc,
    contamination,
    dedup,
    funnel,
    graph,
    linkage,
    lmscore,
    multimodal,
    packing,
    quantize,
    rangejoin,
    sampling,
    similarity,
    sketch,
    text,
    timeseries,
    util,
    validate,
    zorder,
)
