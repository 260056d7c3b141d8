"""Sanity checks on the published benchmark artifacts.

Round-2 verdict: a physically impossible frac_sol (3.78, a trace-window
undercount) shipped in roofline_audit.json. This test makes the
"no frac > 1.05 anywhere published" criterion a CI invariant: any future
audit regeneration that produces an impossible row fails the suite.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = [
    os.path.join(REPO, "roofline_audit.json"),
    os.path.join(REPO, "docs", "roofline_audit.json"),
    os.path.join(REPO, "bsr_grid_results.json"),
]


def _frac_rows(obj, path="$"):
    """Yield (path, frac_sol) from arbitrarily nested artifact JSON."""
    if isinstance(obj, dict):
        if "frac_sol" in obj and isinstance(obj["frac_sol"], (int, float)):
            yield path, float(obj["frac_sol"])
        for k, v in obj.items():
            yield from _frac_rows(v, f"{path}.{k}")
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            yield from _frac_rows(v, f"{path}[{i}]")


@pytest.mark.smoke
@pytest.mark.parametrize("artifact", ARTIFACTS, ids=os.path.basename)
def test_no_impossible_frac_sol(artifact):
    if not os.path.exists(artifact):
        pytest.skip(f"{artifact} not present")
    with open(artifact) as f:
        rows = list(_frac_rows(json.load(f)))
    bad = [(p, v) for p, v in rows if v > 1.05]
    assert not bad, (
        f"physically impossible frac_sol rows in {artifact}: {bad} — "
        "either the measurement undercounts the trace window or the "
        "roofline model undercounts compulsory traffic; fix or exclude"
    )
