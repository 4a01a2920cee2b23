"""LP-format transcription dump tests (debug() artifact parity,
eGLPK.cpp:258 / eGurobi.cpp:127)."""
import numpy as np

from etol_tpu.io import write_lp
from etol_tpu.models import canonical_ocp_2d


def test_write_lp_structure(tmp_path, ocp_xml):
    vgp, nlp = canonical_ocp_2d(ocp_xml)
    data, dims = vgp.to_device()
    p = tmp_path / "debug.lp"
    text = write_lp(nlp, data, path=str(p))
    assert p.exists()
    lines = text.splitlines()
    assert lines[2] == "Minimize"
    assert "Subject To" in lines
    assert "Bounds" in lines
    assert lines[-1] == "End"
    # one linearized row per defect
    assert sum(1 for l in lines if l.startswith(" defect_")) == 32 * 2
    # reference-style variable names
    assert any("x_0_0" in l for l in lines)
    assert any("u_5_1" in l for l in lines)
    # every node contributes inequality rows
    assert sum(1 for l in lines if l.startswith(" ineq_")) == 33 * (9 + 3 + 2)
    # pinned initial state appears as fixed bounds
    assert any(l.strip().startswith("x_0_0 = 1") for l in lines)