"""Capture .explain('formatted') for every HEADLINE query into
plans/r14/<query>_{before,after}.txt (arg: before|after)."""
import os
import sys

sys.path.insert(0, "/root/repo")
from bench import HEADLINE  # noqa: E402
from hielo_spark.queries import QUERIES  # noqa: E402
from hielo_spark.session import get_spark  # noqa: E402

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.dirname(os.path.abspath(__file__))
spark = get_spark(app_name="plan_capture")
spark.sparkContext.setLogLevel("ERROR")
for name in HEADLINE:
    df = QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
        f.write(plan)
    spark.catalog.clearCache()
    print(name, "ok")
spark.stop()
