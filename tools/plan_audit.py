"""Whole-registry physical-plan audit: flags CartesianProduct,
BroadcastNestedLoopJoin, and global-window (unpartitioned WindowExec over
a non-reduced input) nodes in every registered query's plan at sf0.01.

Usage: python tools/plan_audit.py

BNLJ is legitimate when the broadcast side is a tiny stat/spine frame
(a global count, percentile cutpoints, an hour spine) — the audit prints
the name list so ADDITIONS stand out against the pinned baseline in
tests/test_pipeline.py::test_plan_audit_no_new_nested_loops.
CartesianProduct outside ml_als (MLlib's recommendForUserSubset scores
the 20-user × 50-item factor cross as a blocked cartesian by design)
is always a defect. A global window over a non-reduced frame is a
single-task full-frame sort at 100 TB — legitimate only at the
documented-trade sites pinned in
tests/test_pipeline.py::test_plan_audit_no_new_global_windows.
"""
import sys, time

sys.path.insert(0, ".")
from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
from spark_ml_helper_spark.session import get_spark
from spark_ml_helper_spark.plans.audit import global_window_risks

load_all_operators()
spark = get_spark()
sf = "/root/testdata/sf0.01"
bnlj, cart, gwin, errs = [], [], [], []
t0 = time.time()
for name, spec in REGISTRY.items():
    try:
        df = spec.fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as ex:  # noqa: BLE001
        errs.append((name, repr(ex)[:80]))
        continue
    if "BroadcastNestedLoopJoin" in plan:
        bnlj.append(name)
    if "CartesianProduct" in plan:
        cart.append(name)
    if global_window_risks(plan):
        gwin.append(name)
print("bnlj:", sorted(bnlj))
print("cart:", sorted(cart))
print("global_window:", sorted(gwin))
print("errs:", errs)
print(f"audited {len(REGISTRY)} plans in {time.time() - t0:.0f}s")
spark.stop()
