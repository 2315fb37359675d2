"""Shared exception guards for driver-collect fallbacks.

The compress / cluster-meat / compressed-iteration paths collect bounded
results to the driver and fall back to fully distributed assembly when the
result exceeds ``spark.driver.maxResultSize``. Detecting that abort must be
robust: Spark surfaces it as a ``py4j.protocol.Py4JJavaError`` wrapping an
``org.apache.spark.SparkException`` with no machine-readable error
condition (verified on Spark 4.1), so a substring test alone would be
silently disabled by a message rewording. The guard therefore gates on the
exception CLASS first (only Py4J/Spark exceptions qualify — a ValueError
mentioning maxResultSize is not a size abort) and then accepts any of
several message signals Spark has used across versions.
"""

from __future__ import annotations

# message signals for the result-size abort, across Spark versions:
# - "...is bigger than spark.driver.maxResultSize" (DAGScheduler abort)
# - "Tasks result size has exceeded maxResultSize" (TaskKilled reason)
# - "Total size of serialized results ..." (TaskSetManager phrasing)
_RESULT_SIZE_SIGNALS = (
    "maxresultsize",
    "result size has exceeded",
    "total size of serialized results",
)

_SPARK_EXC_CLASS_NAMES = frozenset(
    {"Py4JJavaError", "PySparkException", "SparkException"}
)


def is_result_too_large(exc: BaseException) -> bool:
    """True iff ``exc`` is Spark's result-larger-than-maxResultSize abort.

    Class check: the exception type (or a base) must be a Py4J/Spark
    error — matched by name so no py4j import is needed and captured
    PySpark exception wrappers qualify too. When the Java-side exception
    is reachable it must come from ``org.apache.spark``. Message check:
    any of the known result-size signals (case-insensitive)."""
    mro_names = {c.__name__ for c in type(exc).__mro__}
    if not (mro_names & _SPARK_EXC_CLASS_NAMES):
        return False
    try:
        jexc = getattr(exc, "java_exception", None)
        if jexc is not None:
            jcls = jexc.getClass().getName()
            if not jcls.startswith("org.apache.spark"):
                return False
    except Exception:
        pass  # inspection failure → fall through to the message signals
    text = str(exc).lower()
    return any(sig in text for sig in _RESULT_SIZE_SIGNALS)
