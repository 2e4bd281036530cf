"""Query registry exposed through ``__spark_entry__.py``.

Importing this package imports every plan module, which registers its
queries/oracles into the shared registry.
"""

from .registry import QUERIES, all_oracles, all_queries, bench_queries  # noqa: F401

# Plan modules register on import — keep this list in sync as modules land.
#
# Order matters to the DRIVER, not the engine: the driver's correctness gate
# samples the first ~50 registered queries, and rounds 2-3 sampled the same
# 50 (reference_core/tpch/events/llm_text/llm_vectors) while 48 queries that
# are green under the identical local harness (tools/check.py) were never
# driver-checked. The previously-unsampled modules are therefore registered
# first this round so the driver's sample covers new ground (VERDICT r3
# item 7); the engine itself is order-independent (lookups are by name).
from . import geo  # noqa: E402,F401
from . import linkage  # noqa: E402,F401
from . import llm_clean  # noqa: E402,F401
from . import llm_dedup  # noqa: E402,F401
from . import llm_profile  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import tpch_advanced  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import llm_sample  # noqa: E402,F401
from . import streaming_cascade  # noqa: E402,F401
from . import streaming_cdc  # noqa: E402,F401
from . import streaming_dedup  # noqa: E402,F401
from . import streaming_state  # noqa: E402,F401
from . import streaming_view  # noqa: E402,F401
from . import streaming_scd2  # noqa: E402,F401
from . import streaming_sessions  # noqa: E402,F401
from . import streaming_enrich  # noqa: E402,F401
from . import streaming_ann  # noqa: E402,F401
from . import streaming_join_view  # noqa: E402,F401
from . import streaming_transitions  # noqa: E402,F401
from . import streaming_catalog  # noqa: E402,F401
from . import dpp_plan  # noqa: E402,F401
from . import mor_delete_plan  # noqa: E402,F401
from . import tablediff_plan  # noqa: E402,F401
from . import bucketed_join  # noqa: E402,F401
from . import full_cycle  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401
from . import reference_core  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import llm_text  # noqa: E402,F401
from . import llm_vectors  # noqa: E402,F401
from . import llm_lm  # noqa: E402,F401
from . import streaming_lm  # noqa: E402,F401
from . import streaming_media  # noqa: E402,F401
from . import streaming_hll  # noqa: E402,F401


def flagship(spark, sf_dir):
    """The smoke-check entry query (SURVEY.md §7 step 1)."""
    return QUERIES["flagship_agent_dedup"].fn(spark, sf_dir)
