import sys, time, json
sys.path.insert(0, '/root/repo')
import pyspark.sql.functions as F
from sen2rts_spark.session import get_spark, prewarm_python_workers

INPUT = '/root/repo/.bench_cache/kernel_series.parquet'

def ensure_input():
    import os
    if os.path.exists(INPUT):
        return
    spark = get_spark("kprep", cores=8)
    n_series, n_days = 20000, 300
    df = spark.range(0, n_series * n_days, 1, 64).select(
        (F.col("id") / n_days).cast("long").cast("string").alias("id"),
        F.pmod(F.col("id"), F.lit(n_days)).cast("int").alias("d"))
    df = df.select(
        "id", F.date_add(F.lit("2020-01-01").cast("date"), F.col("d")).alias("date"),
        F.lit("000").alias("orbit"), F.lit("2A").alias("sensor"),
        (0.4 + 0.3 * F.sin(F.col("d") / 40.0)
         + F.pmod(F.abs(F.hash("id", "d")), F.lit(1000)) / 5000.0).alias("value"),
        F.lit(1.0).alias("qa"))
    df.write.mode("overwrite").parquet(INPUT)
    spark.stop()

def run_level(cores, reps=2):
    from sen2rts_spark.operators.timeseries import smooth
    spark = get_spark(f"kscale-{cores}", cores=cores,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as _e; _e._ensure_pyfiles(spark)
    prewarm_python_workers(spark)
    def run():
        df = spark.read.parquet(INPUT)
        return smooth(df, min_qa=0.0, spike=float('nan')).count()
    n = run()  # warm
    out = []
    for _ in range(reps):
        t0 = time.time(); run(); out.append(time.time() - t0)
    spark.stop()
    return n, out

if __name__ == "__main__":
    ensure_input()
    cores = int(sys.argv[1])
    n, ts = run_level(cores)
    print(json.dumps({"cores": cores, "rows": n, "secs": ts}))
