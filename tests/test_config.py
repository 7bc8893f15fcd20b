import os

import pytest

from feddlib_tpu.utils.config import (
    ParameterList, load_xml_parameters, merge_parameter_files)

REF_XML = "/root/reference/feddlib/problems/tests/laplace/parametersPrec.xml"


def test_roundtrip(tmp_path):
    p = ParameterList("Parameters")
    p["Overlap"] = 1
    p["Tolerance"] = 1e-8
    p["TwoLevel"] = True
    p["Name"] = "GDSW"
    sub = p.sublist("Coarse")
    sub["Type"] = "IPOUHarmonic"
    path = str(tmp_path / "p.xml")
    p.write_xml(path)
    q = load_xml_parameters(path)
    assert q["Overlap"] == 1
    assert q["Tolerance"] == 1e-8
    assert q["TwoLevel"] is True
    assert q.sublist("Coarse")["Type"] == "IPOUHarmonic"


def test_merge():
    a = ParameterList("A")
    a["x"] = 1
    a.sublist("S")["y"] = 2
    b = ParameterList("B")
    b["x"] = 3
    b.sublist("S")["z"] = 4
    a.set_parameters(b)
    assert a["x"] == 3
    assert a.sublist("S")["y"] == 2
    assert a.sublist("S")["z"] == 4


@pytest.mark.skipif(not os.path.exists(REF_XML), reason="reference not mounted")
def test_load_reference_xml():
    """Reference configs must load verbatim (config compatibility goal)."""
    p = load_xml_parameters(REF_XML)
    tsp = p.sublist("ThyraPreconditioner", create=False)
    frosch = tsp.sublist("Preconditioner Types", create=False).sublist(
        "FROSch", create=False)
    assert "Overlap" in frosch or len(frosch) > 0
