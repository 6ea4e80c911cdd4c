"""Query plan registry — the engine's correctness surface.

Importing this package registers every query module. ``REGISTRY`` maps
query name → QueryDef(spark_fn, oracle_sql).
"""

from wally_spark.plans.registry import REGISTRY, QueryDef, register  # noqa: F401

# Import for side effect: each module registers its queries.
from wally_spark.plans import tpch  # noqa: F401,E402
from wally_spark.plans import tpch_ext  # noqa: F401,E402
from wally_spark.plans import events  # noqa: F401,E402
from wally_spark.plans import apps  # noqa: F401,E402
from wally_spark.plans import text  # noqa: F401,E402
from wally_spark.plans import dedup  # noqa: F401,E402
from wally_spark.plans import similarity  # noqa: F401,E402
from wally_spark.plans import multimodal  # noqa: F401,E402
from wally_spark.plans import analytics  # noqa: F401,E402
from wally_spark.plans import bucketed  # noqa: F401,E402
from wally_spark.plans import embeddings  # noqa: F401,E402
from wally_spark.plans import sampling  # noqa: F401,E402
