"""Simulate the grading driver: load __spark_entry__ from an arbitrary
cwd, run every queries() entry at sf0.01 (or $SIM_SF_DIR), compare with
oracle_sql() via DuckDB. Usage: python scripts/driver_sim.py [names...]

Full (unfiltered) runs also write REGISTRY_TIMES.json — engine-side
seconds for EVERY registered query — so the two-thirds of the registry
outside bench.HEADLINE has per-round timing visibility
(tests/test_registry_times.py gates the artifact against
tests/registry_times_ref.json; VERDICT r9 ask #4).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle import rows_canonical  # noqa: E402

# A full run on a contended host must not clobber the committed
# clean-host REGISTRY_TIMES.json (it happened in r11: a concurrent run
# overwrote the record and tripped the 4x gate in
# tests/test_registry_times.py with times that said nothing about the
# code). Above this 1-min load at START, the timings go to a side file.
LOADED_HOST_MAX = 4.0
TIMES_NAME = "REGISTRY_TIMES.json"
TIMES_SIDE_NAME = "REGISTRY_TIMES.loaded.json"


def times_artifact_name(load_avg_start: float) -> str:
    """Which artifact a full run may write given its start load."""
    return TIMES_NAME if load_avg_start <= LOADED_HOST_MAX else TIMES_SIDE_NAME


def main() -> int:
    sf = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    spec = importlib.util.spec_from_file_location(
        "se", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    import duckdb

    from mapreduce_framework_in_go_spark.session import get_spark
    from mapreduce_framework_in_go_spark.sources.tables import TABLE_NAMES

    # quiet-host marker read BEFORE any Spark work (r10 advice: reading
    # it at write time recorded the post-run load, misrepresenting the
    # conditions the timings were taken under)
    load_avg_start = float(open("/proc/loadavg").read().split()[0])
    spark = get_spark(app_name="driver-sim", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    # Environment calibration (r12): this box is a VM whose host-level
    # contention is INVISIBLE to guest loadavg (r12 measured a quiet-
    # start full run with kv_get 13x its reference while ps showed
    # nothing running). A fixed whole-stage-codegen workload, timed at
    # run start and end, is a signal the gate can trust: identical
    # work, so its wall measures the environment+JIT tier, not the
    # queries.
    def _calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(1_000_000_000).selectExpr("sum(id % 7)").collect()
        return round(time.perf_counter() - t0, 3)

    _calibrate()  # one untimed warm run (codegen compile)
    # Interleaved series, not just endpoints: r12 observed mid-run
    # contention WAVES (positions 56-139 of a full run at median
    # 3.5-4.6x reference, recovering to 1.75x after — with healthy
    # endpoint calibrations and guest load < 1). One probe every
    # CALIB_EVERY queries costs ~8 s per full run and lets the gate
    # excuse exactly the queries that ran inside a measured wave.
    CALIB_EVERY = 25
    calib_series = [{"after_n": 0, "sec": _calibrate()}]
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    e = m.entry(spark)
    print(f"entry: rows={e.count()} schema={e.schema.simpleString()}")

    qs, osql = m.queries(), m.oracle_sql()
    failures = 0
    engine_secs: dict[str, float] = {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        if len(engine_secs) - calib_series[-1]["after_n"] >= CALIB_EVERY:
            calib_series.append(
                {"after_n": len(engine_secs), "sec": _calibrate()}
            )
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf)
            ec, er = rows_canonical(df.columns, [tuple(r) for r in df.collect()])
        except Exception as ex:
            print(f"FAIL  {name}: engine error {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            # record the failure explicitly (null, not absence): the
            # timing artifact must not silently shrink its coverage
            # when a query errors (r10 advice)
            engine_secs[name] = None
            continue
        engine_secs[name] = round(time.perf_counter() - t0, 3)
        if name not in osql:
            print(f"ok?   {name}: rows-only, {len(er)} rows ({time.perf_counter()-t0:.1f}s)")
            continue
        try:
            res = con.execute(osql[name])
            oc, orr = rows_canonical([d[0] for d in res.description], res.fetchall())
        except Exception as ex:
            print(f"FAIL  {name}: oracle error {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        if ec != oc:
            print(f"FAIL  {name}: cols engine={ec} oracle={oc}")
            failures += 1
        elif er != orr:
            diffs = [(a, b) for a, b in zip(er, orr) if a != b][:2]
            print(
                f"FAIL  {name}: rows engine={len(er)} oracle={len(orr)} first_diffs={diffs}"
            )
            failures += 1
        else:
            print(f"MATCH {name}: {len(er)} rows ({time.perf_counter()-t0:.1f}s)")
    if not only and engine_secs:
        import json

        artifact = times_artifact_name(load_avg_start)
        if artifact != TIMES_NAME:
            print(
                f"WARNING: start load {load_avg_start} > {LOADED_HOST_MAX} "
                f"— contended-host timings written to {artifact}; the "
                f"committed clean-host {TIMES_NAME} is left untouched"
            )
        with open(os.path.join(REPO, artifact), "w") as f:
            json.dump(
                {
                    "sf_dir": sf,
                    "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                    "load_avg_start": load_avg_start,
                    "calib_series": calib_series
                    + [{"after_n": len(engine_secs), "sec": _calibrate()}],
                    "engine_secs": engine_secs,
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
        print(f"wrote {artifact} ({len(engine_secs)} queries)")
    print(f"\n{'ALL MATCH' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
