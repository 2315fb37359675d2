"""Conley (1999) spatial HAC SEs: exact parity vs a numpy brute-force
double-sum oracle (fully independent: dense haversine matrix, kernel
weighting, sandwich assembly), the cutoff→0 ≡ HC1 identity, and the
plan-shape guarantee that the pair enumeration is a cell-keyed equi-join
(never a Cartesian product)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from dbreg_spark import dbreg

N = 600
CUT = 250.0
R_EARTH = 6371.0088


@pytest.fixture(scope="module")
def geo(spark):
    rng = np.random.default_rng(42)
    lat = rng.uniform(30, 45, N)
    lon = rng.uniform(-100, -70, N)
    x1 = rng.normal(size=N)
    x2 = rng.normal(size=N)
    fe = rng.integers(0, 5, N)
    w = rng.uniform(0.5, 2.0, N)
    y = 1.0 + 2.0 * x1 - 1.5 * x2 + fe * 0.3 + rng.normal(size=N)
    pdf = pd.DataFrame(
        dict(y=y, x1=x1, x2=x2, lat=lat, lon=lon, fe=fe.astype("int32"), w=w)
    )
    return spark.createDataFrame(pdf), pdf


def _dist_matrix(lat, lon):
    la, lo = np.radians(lat), np.radians(lon)
    dla = la[:, None] - la[None, :]
    dlo = lo[:, None] - lo[None, :]
    a = (
        np.sin(dla / 2) ** 2
        + np.cos(la)[:, None] * np.cos(la)[None, :] * np.sin(dlo / 2) ** 2
    )
    return 2 * R_EARTH * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def _oracle_se(X, y, d, cutoff, kernel, w=None, df_extra=0):
    if w is None:
        b = np.linalg.solve(X.T @ X, X.T @ y)
        u = y - X @ b
        S = u[:, None] * X
        XtXi = np.linalg.inv(X.T @ X)
    else:
        Xw = X * w[:, None]
        b = np.linalg.solve(X.T @ Xw, Xw.T @ y)
        u = y - X @ b
        S = (w * u)[:, None] * X
        XtXi = np.linalg.inv(X.T @ Xw)
    K = (d <= cutoff).astype(float)
    if kernel == "bartlett":
        K = K * (1 - d / cutoff)
    M = S.T @ K @ S
    n, p = X.shape
    V = (n / (n - p - df_extra)) * XtXi @ M @ XtXi
    return np.sqrt(np.diag(V))


@pytest.mark.slowparity
def test_conley_moments_matches_dense_oracle(geo):
    df, pdf = geo
    d = _dist_matrix(pdf.lat.values, pdf.lon.values)
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    for kernel in ("uniform", "bartlett"):
        m = dbreg(
            "y ~ x1 + x2", df, vcov="conley ~ lat + lon",
            conley_cutoff=CUT, conley_kernel=kernel, strategy="moments",
        )
        se = _oracle_se(X, pdf.y.values, d, CUT, kernel)
        np.testing.assert_allclose(
            m.coeftable["std.error"].values, se, rtol=1e-8
        )


def test_conley_cutoff_zero_is_hc1(geo):
    df, _ = geo
    m0 = dbreg(
        "y ~ x1 + x2", df, vcov="conley ~ lat + lon",
        conley_cutoff=1e-9, strategy="moments",
    )
    mh = dbreg("y ~ x1 + x2", df, vcov="hc1", strategy="moments")
    np.testing.assert_allclose(
        m0.coeftable["std.error"].values,
        mh.coeftable["std.error"].values,
        rtol=1e-9,
    )


def test_conley_demean_matches_within_oracle(geo):
    df, pdf = geo
    d = _dist_matrix(pdf.lat.values, pdf.lon.values)
    g = pdf.groupby("fe")[["y", "x1", "x2"]].transform("mean")
    Xd = np.column_stack([pdf.x1 - g.x1, pdf.x2 - g.x2])
    yd = (pdf.y - g.y).values
    m = dbreg(
        "y ~ x1 + x2 | fe", df, vcov="conley ~ lat + lon",
        conley_cutoff=CUT, strategy="demean",
    )
    # df_res = n - p - G  (HC1-style scale with the absorbed dof)
    se = _oracle_se(Xd, yd, d, CUT, "uniform", df_extra=pdf.fe.nunique())
    np.testing.assert_allclose(m.coeftable["std.error"].values, se, rtol=1e-8)


def test_conley_weighted(geo):
    df, pdf = geo
    d = _dist_matrix(pdf.lat.values, pdf.lon.values)
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    m = dbreg(
        "y ~ x1 + x2", df, vcov="conley ~ lat + lon",
        conley_cutoff=CUT, weights="w", strategy="moments",
    )
    se = _oracle_se(X, pdf.y.values, d, CUT, "uniform", w=pdf.w.values)
    np.testing.assert_allclose(m.coeftable["std.error"].values, se, rtol=1e-8)


def test_conley_euclidean(geo):
    """Projected-plane mode: coordinates and cutoff in the same units."""
    df, pdf = geo
    dx = pdf.lon.values[:, None] - pdf.lon.values[None, :]
    dy = pdf.lat.values[:, None] - pdf.lat.values[None, :]
    d = np.sqrt(dx * dx + dy * dy)
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    m = dbreg(
        "y ~ x1 + x2", df, vcov="conley ~ lat + lon",
        conley_cutoff=3.0, conley_distance="euclidean", strategy="moments",
    )
    se = _oracle_se(X, pdf.y.values, d, 3.0, "uniform")
    np.testing.assert_allclose(m.coeftable["std.error"].values, se, rtol=1e-8)


def test_conley_plan_no_cartesian(geo):
    """The pair pass is a cell-keyed equi-join, never a Cartesian product."""
    from dbreg_spark.plans.conley import conley_meat
    from dbreg_spark.design import build_design
    from dbreg_spark.formula import parse_formula
    from dbreg_spark.plans.common import resolve_source
    from dbreg_spark.plans.frames import build_base_frame

    df, _ = geo
    parsed = parse_formula("y ~ x1 + x2")
    source = resolve_source(spark=df.sparkSession, data=df)
    design = build_design(df, parsed, expand="all", fe_vars=[])
    frame = build_base_frame(
        source, parsed, design, extra_cols=["lat", "lon"], want_sql=False
    )
    # rebuild the pair plan lazily by intercepting: cheapest is to run the
    # meat and assert via the executed plan of an equivalent join
    import pyspark.sql.functions as F

    proj = frame.df.select(
        F.lit(1.0).alias("__e"), "x1", "x2",
        F.col("lat").cast("double").alias("__lat"),
        F.col("lon").cast("double").alias("__lon"),
    )
    cells = proj.withColumn(
        "__cx", F.floor(F.col("__lon") / 2.0)
    ).withColumn("__cy", F.floor(F.col("__lat") / 2.0))
    offs = F.array([F.lit(o) for o in (-1, 0, 1)])
    left = (
        cells.withColumn("__ox", F.explode(offs))
        .withColumn("__oy", F.explode(offs))
        .withColumn("__jx", F.col("__cx") + F.col("__ox"))
        .withColumn("__jy", F.col("__cy") + F.col("__oy"))
        .drop("__ox", "__oy", "__cx", "__cy")
        .alias("l")
    )
    right = (
        cells.withColumnRenamed("__cx", "__jx")
        .withColumnRenamed("__cy", "__jy")
        .alias("r")
    )
    plan = left.join(right, on=["__jx", "__jy"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_conley_pair_join_is_shuffled_not_broadcast(geo):
    """The REAL conley plan must shuffle on the cell key: Spark's size
    estimate undercounts the 9x-exploded side and (without the hint)
    picked a broadcast build inheriting the scan's few partitions — the
    pairwise pass ran on 3 cores (101 s at sf0.1). Pin the plan shape."""
    import pyspark.sql.functions as F

    from dbreg_spark.plans.conley import conley_pair_agg

    df, _ = geo
    proj = df.select(
        F.lit(1.0).alias("__e"), "x1", "x2",
        F.col("lat").cast("double").alias("__lat"),
        F.col("lon").cast("double").alias("__lon"),
    )
    agg_df, _p, cached = conley_pair_agg(
        proj, ["x1", "x2"], True, 2.0, "uniform", "euclidean"
    )
    plan = agg_df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    if cached is not None:
        cached.unpersist()


def test_conley_refusals(geo, spark):
    df, pdf = geo
    with pytest.raises(ValueError, match="conley_cutoff"):
        dbreg("y ~ x1", df, vcov="conley ~ lat + lon")
    with pytest.raises(ValueError, match="two coordinate"):
        dbreg("y ~ x1", df, vcov="conley ~ lat", conley_cutoff=10.0)
    with pytest.raises(ValueError, match="kernel"):
        dbreg("y ~ x1", df, vcov="conley ~ lat + lon", conley_cutoff=10.0,
              conley_kernel="gauss")
    with pytest.raises(NotImplementedError, match="row-level scores"):
        dbreg("y ~ x1", df, vcov="conley ~ lat + lon", conley_cutoff=10.0,
              strategy="compress")
    # NULL coordinates raise with a row count, not a silent drop
    df2 = spark.createDataFrame(
        [(1.0, 1.0, 40.0, -80.0), (2.0, 2.0, None, -81.0),
         (3.0, 1.5, 41.0, -79.0), (0.5, 2.5, 40.5, -80.5)],
        "y double, x1 double, lat double, lon double",
    )
    with pytest.raises(ValueError, match="NULL"):
        dbreg("y ~ x1", df2, vcov="conley ~ lat + lon", conley_cutoff=10.0,
              strategy="moments")
    # latitude outside [-90, 90] under haversine
    pdf3 = pdf.copy()
    pdf3["lat"] = pdf3["lat"] + 100.0
    with pytest.raises(ValueError, match="latitude"):
        dbreg("y ~ x1", spark.createDataFrame(pdf3),
              vcov="conley ~ lat + lon", conley_cutoff=10.0,
              strategy="moments")


def test_conley_cell_occupancy_guard(geo):
    """A degenerate grid (everything in one cell) trips the quadratic
    guard instead of silently running m^2 pair products."""
    df, _ = geo
    with pytest.raises(ValueError, match="max_cell_rows"):
        from dbreg_spark.plans.conley import conley_meat
        from dbreg_spark.design import build_design
        from dbreg_spark.formula import parse_formula
        from dbreg_spark.plans.common import resolve_source
        from dbreg_spark.plans.frames import build_base_frame

        parsed = parse_formula("y ~ x1")
        source = resolve_source(spark=df.sparkSession, data=df)
        design = build_design(df, parsed, expand="all", fe_vars=[])
        frame = build_base_frame(
            source, parsed, design, extra_cols=["lat", "lon"], want_sql=False
        )
        conley_meat(
            frame, np.array([0.0, 0.0]), ["x1"], True, "lat", "lon",
            cutoff=1e6, distance="euclidean", max_cell_rows=100,
        )


# --------------------------------------------------------------------------
# GLM conley (dbglm vcov="conley ~ lat + lon")
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def geo_glm(spark):
    rng = np.random.default_rng(5)
    n = 1200
    lat = rng.uniform(35, 45, n)
    lon = rng.uniform(-90, -80, n)
    x1 = rng.normal(size=n)
    x2 = rng.uniform(size=n)
    fe = rng.integers(0, 6, n)
    eta = 0.3 + 0.5 * x1 - 0.8 * x2 + 0.2 * fe
    y = rng.poisson(np.exp(eta)).astype(float)
    pdf = pd.DataFrame(
        dict(y=y, x1=x1, x2=x2, lat=lat, lon=lon, fe=fe.astype("int32"))
    )
    return spark.createDataFrame(pdf), pdf


def test_glm_conley_poisson_matches_dense(geo_glm):
    from dbreg_spark import dbglm

    df, pdf = geo_glm
    n = len(pdf)
    X = np.column_stack([np.ones(n), pdf.x1, pdf.x2])
    y = pdf.y.values
    b = np.zeros(3)
    for _ in range(60):
        mu = np.exp(X @ b)
        z = X @ b + (y - mu) / mu
        bn = np.linalg.solve(X.T @ (mu[:, None] * X), X.T @ (mu * z))
        if np.max(np.abs(bn - b)) < 1e-13:
            b = bn
            break
        b = bn
    mu = np.exp(X @ b)
    d = _dist_matrix(pdf.lat.values, pdf.lon.values)
    S = (y - mu)[:, None] * X
    K = (d <= CUT).astype(float)
    A_inv = np.linalg.inv(X.T @ (mu[:, None] * X))
    V = (n / (n - 3)) * A_inv @ (S.T @ K @ S) @ A_inv
    m = dbglm("y ~ x1 + x2", df, family="poisson",
              vcov="conley ~ lat + lon", conley_cutoff=CUT)
    np.testing.assert_allclose(
        m.coeftable["std.error"].values, np.sqrt(np.diag(V)), rtol=1e-6
    )


def test_glm_conley_cutoff_zero_is_hc1(geo_glm):
    from dbreg_spark import dbglm

    df, _ = geo_glm
    m0 = dbglm("y ~ x1 + x2", df, family="poisson",
               vcov="conley ~ lat + lon", conley_cutoff=1e-9)
    mh = dbglm("y ~ x1 + x2", df, family="poisson", vcov="hc1")
    np.testing.assert_allclose(
        m0.coeftable["std.error"].values,
        mh.coeftable["std.error"].values, rtol=1e-9,
    )


def test_fepois_conley_cutoff_zero_is_hc1(geo_glm):
    """The profiled-score conley path: cutoff->0 reproduces fepois hc1
    exactly (same scores, same n/df_res scale)."""
    from dbreg_spark import dbglm

    df, _ = geo_glm
    m0 = dbglm("y ~ x1 + x2 | fe", df, family="poisson",
               vcov="conley ~ lat + lon", conley_cutoff=1e-9)
    mh = dbglm("y ~ x1 + x2 | fe", df, family="poisson", vcov="hc1")
    np.testing.assert_allclose(
        m0.coeftable["std.error"].values,
        mh.coeftable["std.error"].values, rtol=1e-8,
    )


def test_glm_conley_refusals(geo_glm):
    from dbreg_spark import dbglm

    df, _ = geo_glm
    with pytest.raises(ValueError, match="conley_cutoff"):
        dbglm("y ~ x1", df, family="poisson", vcov="conley ~ lat + lon")


def test_iv_conley_matches_dense(spark):
    """Conley 2SLS: Z-score spatial meat mapped by Gamma, vs a dense
    numpy 2SLS sandwich; cutoff->0 reproduces dbiv hc1."""
    from dbreg_spark import dbiv

    rng = np.random.default_rng(13)
    n = 900
    lat = rng.uniform(35, 45, n)
    lon = rng.uniform(-90, -80, n)
    z = rng.normal(size=n)
    u = rng.normal(size=n)
    x_end = 0.7 * z + 0.5 * u + rng.normal(size=n)
    x_ex = rng.normal(size=n)
    y = 1.0 + 1.5 * x_end + 0.8 * x_ex + u
    df = spark.createDataFrame(
        pd.DataFrame(dict(y=y, x_end=x_end, x_ex=x_ex, z=z, lat=lat, lon=lon))
    )
    m = dbiv("y ~ x_ex | x_end ~ z", df, vcov="conley ~ lat + lon",
             conley_cutoff=CUT)
    X = np.column_stack([np.ones(n), x_ex, x_end])
    Z = np.column_stack([np.ones(n), x_ex, z])
    Azz, Azx, Azy = Z.T @ Z, Z.T @ X, Z.T @ y
    M = Azx.T @ np.linalg.inv(Azz) @ Azx
    b = np.linalg.solve(M, Azx.T @ np.linalg.inv(Azz) @ Azy)
    uu = y - X @ b
    d = _dist_matrix(lat, lon)
    K = (d <= CUT).astype(float)
    Sz = uu[:, None] * Z
    Gamma = np.linalg.inv(Azz) @ Azx
    Minv = np.linalg.inv(M)
    V = (n / (n - 3)) * Minv @ (Gamma.T @ (Sz.T @ K @ Sz) @ Gamma) @ Minv
    np.testing.assert_allclose(
        m.coeftable["std.error"].values, np.sqrt(np.diag(V)), rtol=1e-7
    )
    m0 = dbiv("y ~ x_ex | x_end ~ z", df, vcov="conley ~ lat + lon",
              conley_cutoff=1e-9)
    mh = dbiv("y ~ x_ex | x_end ~ z", df, vcov="hc1")
    np.testing.assert_allclose(
        m0.coeftable["std.error"].values,
        mh.coeftable["std.error"].values, rtol=1e-9,
    )
    with pytest.raises(ValueError, match="conley_cutoff"):
        dbiv("y ~ x_ex | x_end ~ z", df, vcov="conley ~ lat + lon")


def test_split_conley_batched_matches_per_level(geo, monkeypatch):
    """dbreg_split(vcov='conley ~ lat + lon') matches a per-level dbreg
    conley fit exactly, and every level's meat rides ONE batched pair
    join (call count pinned)."""
    import dbreg_spark.plans.conley as conley_mod
    import dbreg_spark.split as split_mod
    from dbreg_spark.split import dbreg_split

    df, pdf = geo
    df2 = df.withColumn("grp", (F.col("fe") % 2).cast("int"))

    calls = {"n": 0}
    orig = conley_mod.conley_pair_agg_batched

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(conley_mod, "conley_pair_agg_batched", counting)
    # split.py imports the symbol inside the function body from the module,
    # so patching the module attribute is enough

    sp = dbreg_split(
        "y ~ x1 + x2", df2, split="grp",
        vcov="conley ~ lat + lon", conley_cutoff=CUT,
    )
    assert calls["n"] == 1
    for lvl in (0, 1):
        o = dbreg(
            "y ~ x1 + x2", df2.where(F.col("grp") == lvl),
            vcov="conley ~ lat + lon", conley_cutoff=CUT,
        )
        m = sp[lvl]
        np.testing.assert_allclose(
            m.coeftable["estimate"].values,
            o.coeftable["estimate"].values, rtol=1e-10,
        )
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-9,
        )


def test_split_conley_demean_matches_per_level(geo):
    """Batched split conley on a 1-FE demean model: the within residual
    scores and per-level FE dof match the single-model path."""
    from dbreg_spark.split import dbreg_split

    df, pdf = geo
    df2 = df.withColumn("grp", (F.col("fe") % 2).cast("int"))
    sp = dbreg_split(
        "y ~ x1 + x2 | fe", df2, split="grp", strategy="demean",
        vcov="conley ~ lat + lon", conley_cutoff=CUT,
        conley_kernel="bartlett",
    )
    for lvl in (0, 1):
        o = dbreg(
            "y ~ x1 + x2 | fe", df2.where(F.col("grp") == lvl),
            strategy="demean", vcov="conley ~ lat + lon",
            conley_cutoff=CUT, conley_kernel="bartlett",
        )
        m = sp[lvl]
        np.testing.assert_allclose(
            m.coeftable["estimate"].values,
            o.coeftable["estimate"].values, rtol=1e-9,
        )
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-8,
        )


def test_multi_conley_batched_matches_per_model(geo, monkeypatch):
    """dbreg_multi(vcov='conley ~ lat + lon'): every submodel's spatial
    meat from ONE batched pair join — parity vs per-model dbreg conley,
    pair-pass count pinned at 1."""
    import dbreg_spark.plans.conley as conley_mod
    from dbreg_spark.multi import dbreg_multi

    df, pdf = geo
    calls = {"n": 0}
    orig = conley_mod.conley_pair_agg_batched

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(conley_mod, "conley_pair_agg_batched", counting)
    mm = dbreg_multi(
        "y ~ sw(x1, x2)", df, vcov="conley ~ lat + lon",
        conley_cutoff=CUT,
    )
    assert calls["n"] == 1
    assert mm.n_passes == 2  # union Gram + ONE batched conley pair pass
    for (yv, step), m in mm.models.items():
        o = dbreg(
            f"{yv} ~ {step}", df, vcov="conley ~ lat + lon",
            conley_cutoff=CUT,
        )
        np.testing.assert_allclose(
            m.coeftable["estimate"].values,
            o.coeftable["estimate"].values, rtol=1e-10,
        )
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-9,
        )


def test_multi_conley_demean_matches_per_model(geo):
    from dbreg_spark.multi import dbreg_multi

    df, pdf = geo
    mm = dbreg_multi(
        "y ~ csw(x1, x2) | fe", df, vcov="conley ~ lat + lon",
        conley_cutoff=CUT, conley_kernel="bartlett",
    )
    for (yv, step), m in mm.models.items():
        o = dbreg(
            f"{yv} ~ {step} | fe", df, strategy="demean",
            vcov="conley ~ lat + lon", conley_cutoff=CUT,
            conley_kernel="bartlett",
        )
        np.testing.assert_allclose(
            m.coeftable["estimate"].values,
            o.coeftable["estimate"].values, rtol=1e-9,
        )
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-8,
        )


def test_glm_split_conley_batched_matches_per_level(geo_glm, monkeypatch):
    """dbglm_split(vcov='conley ~ lat + lon'): per-level family scores in
    ONE batched pair join — parity vs per-level dbglm conley."""
    import dbreg_spark.plans.conley as conley_mod
    from dbreg_spark import dbglm
    from dbreg_spark.split_glm import dbglm_split

    df, pdf = geo_glm
    df2 = df.withColumn("grp", (F.col("fe") % 2).cast("int"))
    calls = {"n": 0}
    orig = conley_mod.conley_pair_agg_batched

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(conley_mod, "conley_pair_agg_batched", counting)
    sp = dbglm_split(
        "y ~ x1 + x2", df2, split="grp", family="poisson",
        vcov="conley ~ lat + lon", conley_cutoff=CUT,
    )
    assert calls["n"] == 1
    for lvl in (0, 1):
        o = dbglm(
            "y ~ x1 + x2", df2.where(F.col("grp") == lvl),
            family="poisson", vcov="conley ~ lat + lon",
            conley_cutoff=CUT,
        )
        m = sp[lvl]
        np.testing.assert_allclose(
            m.coeftable["estimate"].values,
            o.coeftable["estimate"].values, rtol=1e-7,
        )
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-6,
        )


def test_glm_multi_conley_batched_matches_per_model(geo_glm, monkeypatch):
    """dbglm_multi(vcov='conley ~ lat + lon'): every submodel's spatial
    meat (family scores at its own final beta) from ONE batched pair
    join — parity vs per-model dbglm conley, pair passes pinned."""
    import dbreg_spark.plans.conley as conley_mod
    from dbreg_spark import dbglm
    from dbreg_spark.multi_glm import dbglm_multi

    df, pdf = geo_glm
    calls = {"n": 0}
    orig = conley_mod.conley_pair_agg_batched

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(conley_mod, "conley_pair_agg_batched", counting)
    mm = dbglm_multi(
        "y ~ sw(x1, x2)", df, family="poisson",
        vcov="conley ~ lat + lon", conley_cutoff=CUT,
    )
    assert calls["n"] == 1
    for (yv, step), m in mm.models.items():
        o = dbglm(
            f"{yv} ~ {step}", df, family="poisson",
            vcov="conley ~ lat + lon", conley_cutoff=CUT,
        )
        np.testing.assert_allclose(
            m.coeftable["estimate"].values,
            o.coeftable["estimate"].values, rtol=1e-8,
        )
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-6,
        )
