"""The declared query inventory (SURVEY.md §2.2), split by tier.

Package layout (round-5 de-risking of the former 7,000-line module —
same registry keys, same oracle artifact):

  * ``_shared``            — the ``@q`` registry, shared imports, helpers
  * ``tier_core_sql``      — relational/SQL surface: scans, joins,
                             aggregates, set ops, subqueries, optimizer
                             demos (round-10 split)
  * ``tier_core_window``   — window/event-time/sessionization/trend
                             analytics (round-10 split of tier_core_sql)
  * ``tier_core_udf``      — Python-boundary + SQL-language surface
                             (round-10 split of tier_core_sql)
  * ``tier_timeseries``    — time-series / interval / sequence
                             analytics (round-9 split of tier_stats_ts)
  * ``tier_stats``         — statistical / evaluation analytics
                             (round-9 split of tier_stats_ts)
  * ``tier_quality_audit`` — data-quality / privacy-publishing / sketch
                             contracts (round-9 split of tier_stats_ts)
  * ``tier_experiment_gov``— experimentation / attribution analytics
                             (round-8 split; governance moved out round 10)
  * ``tier_governance``    — governance / layout / table-ops audits
                             (round-10 split of tier_experiment_gov)
  * ``tier_llm_dedup``     — dedup / entity resolution / curation (round-8
                             split of the former 8,000-line tier_llm)
  * ``tier_llm_vectors``   — similarity / ANN / embeddings / k-means / PCA
  * ``tier_llm_text``      — text quality / tokenization / LM / sampling /
                             multimodal
  * ``tier_llm_graph``     — graph algorithms over the customer graph
  * ``tier_llm_eval``      — drift / agreement / funnels / sketches /
                             datasheets
  * ``tier_streaming``     — Structured Streaming queries
  * ``tier_contracts_io`` — typed IO round-trips, MERGE/SCD2, expectations

Importing this package registers every query; ``queries()`` and
``oracle_sql()`` remain the assembly points the driver consumes.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, oracle_sql, q, queries  # noqa: F401

# importing the tier modules registers their queries (order: core first
# for the flagship; llm before nothing in particular — intra-module
# registration order is preserved where it matters, e.g. q190 reading
# q150's oracle inside tier_llm)
from . import tier_core_sql  # noqa: E402,F401
from . import tier_core_window  # noqa: E402,F401
from . import tier_core_udf  # noqa: E402,F401
from . import tier_timeseries  # noqa: E402,F401
from . import tier_stats  # noqa: E402,F401
from . import tier_quality_audit  # noqa: E402,F401
from . import tier_experiment_gov  # noqa: E402,F401
from . import tier_governance  # noqa: E402,F401
from . import tier_llm_dedup  # noqa: E402,F401
from . import tier_llm_vectors  # noqa: E402,F401
from . import tier_llm_text  # noqa: E402,F401
from . import tier_llm_graph  # noqa: E402,F401
from . import tier_llm_eval  # noqa: E402,F401
from . import tier_streaming  # noqa: E402,F401
from . import tier_contracts_io  # noqa: E402,F401
from .tier_core_sql import flagship  # noqa: E402,F401
# module-level SQL constants some tests exercise directly
from .tier_core_window import _Q169_SQL, _Q170_SQL  # noqa: E402,F401
