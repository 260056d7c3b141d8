"""Multi-controller SPMD validation (2 OS processes x 4 CPU devices, gloo).

The rest of the suite validates sharding on a single-process CPU mesh;
this spawns REAL process boundaries so psum / all_gather / psum_scatter /
all_to_all cross a non-shared-memory edge, the single-host stand-in for a
multi-host TPU pod (SURVEY.md §2.8 / §4 "multi-host tests must be built
fresh"). See ``sputnik_tpu/bench/multiproc.py`` for the cases.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multiprocess_spmd(tmp_path):
    out = tmp_path / "MULTIPROC.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    r = subprocess.run(
        [sys.executable, "-m", "sputnik_tpu.bench.multiproc",
         "--nproc", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    art = json.loads(out.read_text())
    assert art["global_devices"] == 8
    assert set(art["cases"]) == {
        "dsd_row", "dsd_kgather", "csr_kshard", "ep_moe", "moe_train",
    }
    assert all(c["ok"] for c in art["cases"].values()), art["cases"]
