"""Experiment 2: where does fresh-run execution time go, per lever.

 a) raw scan+sum of lineitem 1 col (fresh each run) — scan floor
 b) q_groupby_agg with plain SUM (no dsum casts) — cast cost
 c) q_join3_topk under 3 join strategies — broadcast-build cost
 d) q_window at sp in {1,2,4,8} — window parallelism
 e) q_events_session at sp in {1,2,4,8}
 f) alias-rewrap trick: cached analyzed df + .alias per run vs full rebuild
All interleaved, median of 5.
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ksql_spark.registry import all_specs
from ksql_spark.session import get_spark
from ksql_spark.tables import load

SF = "/root/testdata/sf0.1"
REPS = 5


def main() -> None:
    spark = get_spark(app_name="bench-exp2", shuffle_partitions=1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
    specs = all_specs()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    cases = {}

    def case(name, fn):
        cases[name] = fn

    li = load(spark, SF, "lineitem")

    case("a_scan_sum1", lambda: noop(
        spark.sql("SELECT SUM(l_quantity) s FROM {li}", li=li)))
    case("b_group_plain", lambda: noop(spark.sql(
        """SELECT l_returnflag, l_linestatus, SUM(l_quantity) a,
                  SUM(l_extendedprice) b,
                  SUM(l_extendedprice*(1-l_discount)) c,
                  AVG(l_quantity) d, COUNT(*) e
           FROM {li} GROUP BY l_returnflag, l_linestatus""", li=li)))

    o = load(spark, SF, "orders")
    c = load(spark, SF, "customer")
    n = load(spark, SF, "nation")
    J = """SELECT {hint} n_name, SUM(l_extendedprice*(1-l_discount)) rev,
                  COUNT(*) lc
           FROM {{li}} JOIN {{o}} ON l_orderkey=o_orderkey
           JOIN {{c}} ON o_custkey=c_custkey
           JOIN {{n}} nn ON c_nationkey=n_nationkey
           GROUP BY n_name ORDER BY rev DESC, n_name LIMIT 10"""

    def join_with(hint, sp):
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        noop(spark.sql(J.format(hint=hint), li=li, o=o, c=c, n=n))
        spark.conf.set("spark.sql.shuffle.partitions", "1")

    case("c_join_bcast_all",
         lambda: join_with("/*+ BROADCAST(nn), BROADCAST({c}), BROADCAST({o}) */", 1))
    case("c_join_shuffle_sp8",
         lambda: join_with("/*+ BROADCAST(nn), SHUFFLE_HASH({o}), SHUFFLE_HASH({c}) */", 8))
    case("c_join_shuffle_sp32",
         lambda: join_with("/*+ BROADCAST(nn), SHUFFLE_HASH({o}), SHUFFLE_HASH({c}) */", 32))
    case("c_join_bc_c_sh_o",
         lambda: join_with("/*+ BROADCAST(nn), BROADCAST({c}), SHUFFLE_HASH({o}) */", 8))

    W = """SELECT c_custkey, o_orderkey, o_totalprice, rnk FROM (
             SELECT c_custkey, o_orderkey, o_totalprice,
                    ROW_NUMBER() OVER (PARTITION BY c_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) rnk
             FROM {o} JOIN {c} ON o_custkey=c_custkey) WHERE rnk <= 3"""

    def win_sp(sp):
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        noop(spark.sql(W, o=o, c=c))
        spark.conf.set("spark.sql.shuffle.partitions", "1")

    for sp in (1, 2, 4, 8):
        case(f"d_window_sp{sp}", lambda sp=sp: win_sp(sp))

    ev = load(spark, SF, "events")
    E = """SELECT date_trunc('hour', ts) h, user_id, COUNT(*) ne, SUM(value) sv
           FROM {ev} GROUP BY h, user_id"""

    def ev_sp(sp):
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        noop(spark.sql(E, ev=ev))
        spark.conf.set("spark.sql.shuffle.partitions", "1")

    for sp in (1, 2, 4, 8):
        case(f"e_events_sp{sp}", lambda sp=sp: ev_sp(sp))

    gb_df = specs["q_groupby_agg"].builder(spark, SF)
    case("f_alias_rewrap", lambda: noop(gb_df.alias("r")))
    case("f_full_rebuild", lambda: noop(specs["q_groupby_agg"].builder(spark, SF)))

    for fn in cases.values():  # warm
        fn()
    samples = {k: [] for k in cases}
    for _ in range(REPS):
        for k, fn in cases.items():
            t0 = time.perf_counter()
            fn()
            samples[k].append(time.perf_counter() - t0)
    print(json.dumps({k: round(statistics.median(v) * 1000, 1)
                      for k, v in samples.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
