"""The grading driver loads ``__spark_entry__.py`` from an arbitrary
cwd: executor Python workers then cannot import this package from the
inherited working directory, and any UDF pickled BY REFERENCE
(applyInPandas / applyInPandasWithState / foreachBatch module members)
dies with ModuleNotFoundError unless ``pyship.ensure_package_shipped``
ships the package zip. This subprocess test pins that contract on the
four query families that actually cross the boundary (WGL checker via
grouped map, stateful streaming folds)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from mapreduce_framework_in_go_spark.registry import all_queries
from mapreduce_framework_in_go_spark.session import get_spark
spark = get_spark(app_name='foreigncwd', cpus=4, shuffle_partitions=4)
qs = all_queries()
for name in ['kv_linearizability', 'kv_linearizability_contract',
             'stream_kv_state_fold', 'stream_near_dedup',
             'stream_transition_matrix', 'stream_substring_probe',
             'udtf_token_positions', 'udaf_median_acctbal',
             'mm_png_decode_stats', 'warc_archive_read']:
    n = qs[name].fn(spark, '/root/testdata/sf0.001').count()
    assert n > 0, name
print('FOREIGN_CWD_OK')
"""


def test_pandas_udf_queries_run_from_foreign_cwd(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),  # decidedly not the repo
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert "FOREIGN_CWD_OK" in out.stdout, out.stderr[-2000:]
