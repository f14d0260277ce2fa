from pyspark.sql import functions as F

from ilogtail_spark.operators.route import (
    Route,
    dynamic_sink_name,
    logstore_router,
    route_multicast,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, "err", "x"), (2, "ok", "y"), (3, "err", None)],
        "id int, status string, tag string",
    )


def test_multicast_copy_semantics(spark):
    # Router.cpp:62-84 — conditional match + unconditional always copy
    routes = [
        Route("errors", F.col("status") == "err"),
        Route("all", None),
    ]
    out = route_multicast(_df(spark), routes).collect()
    by_sink = {}
    for r in out:
        by_sink.setdefault(r["__sink__"], []).append(r["id"])
    assert sorted(by_sink["errors"]) == [1, 3]
    assert sorted(by_sink["all"]) == [1, 2, 3]
    # default only for rows with NO conditional match
    assert sorted(by_sink["default"]) == [2]


def test_multicast_no_default(spark):
    routes = [Route("errors", F.col("status") == "err")]
    out = route_multicast(_df(spark), routes, default_sink=None)
    assert out.count() == 2


def test_discarding_tag(spark):
    routes = [Route("errors", F.col("status") == "err", discarding_tag=["tag"])]
    out = route_multicast(_df(spark), routes, default_sink="default").collect()
    for r in out:
        if r["__sink__"] == "errors":
            assert r["tag"] is None
        elif r["id"] == 2:
            assert r["tag"] == "y"


def test_logstore_router_first_match_exclusive(spark):
    df = spark.createDataFrame(
        [(1, "svc-a-prod"), (2, "svc-b-dev"), (3, "other")], "id int, name string"
    )
    out = logstore_router(
        df, "name", [(r"svc-.*-prod", "prod"), (r"svc-.*", "nonprod")]
    ).collect()
    got = {r.id: r["__sink__"] for r in out}
    assert got == {1: "prod", 2: "nonprod", 3: "default"}
    # DropDisMatch drops unrouted (aggregator_router.go:97-111)
    out = logstore_router(
        df, "name", [(r"svc-.*-prod", "prod")], drop_dismatch=True
    )
    assert out.count() == 1


def test_dynamic_sink_name(spark):
    df = spark.createDataFrame(
        [(1, "payments", "2024-03-05 10:00:00")], "id int, app string, t string"
    ).withColumn("ts", F.col("t").cast("timestamp"))
    out = dynamic_sink_name(df, "logs_%{app}_%{+yyyyMMdd}").first()
    assert out["__sink__"] == "logs_payments_20240305"
