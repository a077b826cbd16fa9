"""Driver-parity gate: run the full driver window on a VANILLA SparkSession.

Rounds 6 and 7 both shipped a red q74 while pytest was green, for two
different session-construction reasons (r6: a transpile bug only the
driver's exact SQL hit; r7: UDF shims registered only inside
session.get_spark). Every other test goes through the ``spark`` fixture
(get_spark), so a mismatch between our session setup and the driver's
bare ``SparkSession.builder.getOrCreate()`` is invisible to them.

This test runs ``tools/oracle_check.py --vanilla`` in a SUBPROCESS (a
same-process getOrCreate would silently reuse the fixture session and
defeat the point) over every DRIVER_KEY at sf0.001, comparing values
against DuckDB exactly like the driver gate does.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_window_on_vanilla_session(sf_dir):
    from vscode_parquet_visualizer_spark import workload

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "oracle_check.py"),
            "--vanilla",
            sf_dir,
            *workload.DRIVER_KEYS,
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd="/tmp",  # the driver's cwd is not the repo; ship_package must cover it
        env={**os.environ, "PYTHONPATH": REPO},
    )
    tail = "\n".join(proc.stdout.splitlines()[-60:])
    assert proc.returncode == 0, f"vanilla-session oracle check failed:\n{tail}\n{proc.stderr[-2000:]}"
