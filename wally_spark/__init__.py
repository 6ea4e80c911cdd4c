"""wally_spark — a PySpark-native analytics/stream engine with the
capabilities of WallarooLabs/wally (reference surveyed in SURVEY.md).

Public surface:
  - ``wally_spark.api``: Wallaroo-style pipeline builder compiled to
    Spark DataFrame / Structured Streaming plans.
  - ``wally_spark.plans``: query registry (the correctness surface).
  - ``wally_spark.session``: tuned SparkSession factory.
"""

from wally_spark.session import get_spark  # noqa: F401
from wally_spark.tables import load_tables  # noqa: F401

__version__ = "0.1.0"
