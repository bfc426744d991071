"""Multi-executor smoke test: the kernel-heavy entries on a REAL
local-cluster master.

Everything else in the suite runs on ``local[32]`` — one JVM, where
closure serialization, task shipping, and broadcast transport are
partially faked (the driver and executor share a heap). The
``local-cluster[2,2,1536]`` master spawns separate worker JVMs, so the
paths a 1000-executor deployment depends on are real here: pickled
task closures (the MinHash seed arrays, the k-NN query matrix, the
JPEG Huffman tables), broadcast blocks over RPC (the IVF centroids,
the verify-join candidate sets), Arrow batch transport to remote
Python workers, and executor-side module imports of this package.

Runs in a SUBPROCESS: a second SparkSession with a different master
cannot coexist with the session fixture's JVM, and a fresh process is
exactly the deployment shape (driver that never shared state with the
executors). Row counts must match the local-mode session's — a
closure-serialization regression shows up as a crash or a count drift.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# kernel-heavy entries: numpy pandas_udf / mapInPandas closures,
# broadcasts, and driver-side bounded collects — the serialization
# surface. One relational decimal query pins codegen + shuffle.
CLUSTER_ENTRIES = [
    "dedup_minhash_lsh",
    "embed_knn_bruteforce",
    "embed_ann_ivf_fullprobe",
    "embed_ann_ivfpq",  # PQ codebooks + ADC LUTs in task closures
    "multimodal_jpeg_features",
    "multimodal_video_frames",  # mjpeg mux/demux + per-frame decode
    "text_perplexity",  # broadcast vocab counts over worker JVMs
    "embed_semantic_dedup",  # centroid closure + applyInPandas cells
    "embed_semantic_screen",  # r9: screen kernel via worker JVMs
    "dedup_substring_screen",  # r9: per-row window-hash expression
    "q1_pricing_summary",
]

_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# Executor python workers run in SEPARATE worker JVMs here, so the
# driver's sys.path does NOT reach them (it does, silently, in
# local[N] — which is why only this test can catch it). Kernels whose
# closures reference package-level functions are pickled BY REFERENCE
# and re-imported executor-side; a real deployment pip-installs the
# package on executors or ships it via --py-files. PYTHONPATH via
# executorEnv models that.
spark = (
    SparkSession.builder.master("local-cluster[2,2,1536]")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.default.parallelism", "4")
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    .getOrCreate()
)
import __spark_entry__ as E
qs = E.queries()
out = {{}}
for name in {entries!r}:
    out[name] = qs[name](spark, {sf!r}).count()
spark.stop()
print("CLUSTER_RESULT " + json.dumps(out))
"""


@pytest.mark.slow
def test_kernel_entries_on_local_cluster(spark, tables):
    import __spark_entry__ as E

    qs = E.queries()
    expected = {n: qs[n](spark, SF_DIR).count() for n in CLUSTER_ENTRIES}

    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _SCRIPT.format(repo=REPO, entries=CLUSTER_ENTRIES, sf=SF_DIR),
        ],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        f"local-cluster run failed:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-4000:]}"
    )
    line = next(
        ln for ln in proc.stdout.splitlines()
        if ln.startswith("CLUSTER_RESULT ")
    )
    got = json.loads(line[len("CLUSTER_RESULT "):])
    assert got == expected
    assert all(v > 0 for v in expected.values())
