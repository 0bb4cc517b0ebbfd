"""Single import point that registers EVERY (query, oracle) pair.

bench.py, __spark_entry__.py, and the test suite all import this module
instead of maintaining their own operator-module lists — a module added
here is automatically benched, driver-checked, and tripwired; a module
missed here is missed everywhere, which the registry-consistency test
turns into a hard failure.
"""

from __future__ import annotations

import trialstreamer_spark.operators.clustering  # noqa: F401
import trialstreamer_spark.operators.dedup  # noqa: F401
import trialstreamer_spark.operators.multimodal  # noqa: F401
import trialstreamer_spark.operators.packing  # noqa: F401
import trialstreamer_spark.operators.quality  # noqa: F401
import trialstreamer_spark.operators.retrieval  # noqa: F401
import trialstreamer_spark.operators.similarity  # noqa: F401
import trialstreamer_spark.operators.temporal  # noqa: F401
import trialstreamer_spark.operators.textstats  # noqa: F401
import trialstreamer_spark.plans.relational  # noqa: F401
import trialstreamer_spark.streaming.parity  # noqa: F401

from trialstreamer_spark.plans.registry import ORACLES, QUERIES  # noqa: F401,E402
