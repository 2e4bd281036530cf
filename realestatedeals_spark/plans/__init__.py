"""Query registry exposed through ``__spark_entry__.py``.

Importing this package imports every plan module, which registers its
queries/oracles into the shared registry.
"""

from .registry import QUERIES, all_oracles, all_queries, bench_queries  # noqa: F401

# Plan modules register on import — keep this list in sync as modules land.
from . import reference_core  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import llm_text  # noqa: E402,F401
from . import llm_vectors  # noqa: E402,F401
from . import llm_dedup  # noqa: E402,F401
from . import llm_profile  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import tpch_advanced  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import llm_sample  # noqa: E402,F401
from . import streaming_cdc  # noqa: E402,F401


def flagship(spark, sf_dir):
    """The smoke-check entry query (SURVEY.md §7 step 1)."""
    return QUERIES["flagship_agent_dedup"].fn(spark, sf_dir)
