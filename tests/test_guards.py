"""Unit tests for the maxResultSize abort detector (VERDICT r04 #5):
matching must gate on the exception class, and survive Spark rewording the
message, so the driver-collect fallbacks cannot be silently disabled."""

from dbreg_spark.guards import is_result_too_large

# stand-ins with the real Py4J class name — is_result_too_large matches by
# MRO class name so it needs no live JVM to be exercised
Py4JJavaError = type("Py4JJavaError", (Exception,), {})


def test_current_spark_message_matches():
    exc = Py4JJavaError(
        "An error occurred while calling o37.collectToPython.\n"
        ": org.apache.spark.SparkException: Job aborted due to stage "
        "failure: Total size of serialized results of 1 tasks (6.2 MiB) is "
        "bigger than spark.driver.maxResultSize (1024.0 B)"
    )
    assert is_result_too_large(exc)


def test_reworded_message_still_matches_via_alternate_signals():
    # drop the config-key spelling entirely — the TaskKilled phrasing and
    # the TaskSetManager phrasing must each still trigger the fallback
    assert is_result_too_large(
        Py4JJavaError("TaskKilled (Tasks result size has exceeded the limit)")
    )
    assert is_result_too_large(
        Py4JJavaError(
            "Job aborted: total size of serialized results of 4 tasks "
            "(24.7 MiB) exceeds the configured cap"
        )
    )


def test_non_spark_exception_never_matches():
    # class gate: a ValueError mentioning maxResultSize is NOT a size abort
    assert not is_result_too_large(
        ValueError("user text containing maxResultSize")
    )
    assert not is_result_too_large(
        RuntimeError("Tasks result size has exceeded maxResultSize")
    )


def test_unrelated_spark_error_never_matches():
    assert not is_result_too_large(
        Py4JJavaError(
            "org.apache.spark.SparkException: Job aborted due to stage "
            "failure: java.lang.ArithmeticException: / by zero"
        )
    )


def test_pyspark_captured_wrapper_matches():
    # pyspark.errors wrappers derive from PySparkException — same gate
    PySparkException = type("PySparkException", (Exception,), {})
    Captured = type("AnalysisException", (PySparkException,), {})
    assert is_result_too_large(
        Captured("result is bigger than spark.driver.maxResultSize")
    )
