"""Translation of reference (Teuchos/Stratimikos/FROSch) XML parameter
trees into feddlib_tpu's flat solver keys — so the reference's committed
config files run verbatim (SURVEY.md §5: "keep the same logical keys").

Mapping:
  parametersSolver.xml:
    ThyraSolver → Linear Solver Types → Belos → Solver Types →
      Block GMRES → {Convergence Tolerance, Maximum Iterations, Num Blocks}
  parametersPrec.xml:
    ThyraPreconditioner → Preconditioner Types → FROSch →
      {Overlap, TwoLevel, CoarseOperator Type,
       AlgebraicOverlappingOperator → Combine Values in Overlap, ...}
  parametersProblem.xml: problem-specific scalars (Viscosity, Density,
    Poisson Ratio, E/Mu, dt/final time ...) under 'Parameter'.
"""

from __future__ import annotations

from feddlib_tpu.utils.config import ParameterList, load_xml_parameters


def _find(plist: ParameterList, *path, default=None):
    cur = plist
    for p in path:
        if not isinstance(cur, ParameterList) or p not in cur:
            return default
        cur = cur[p]
    return cur


def translate_solver(p: ParameterList, out: ParameterList) -> None:
    for solver_name in ("Block GMRES", "Pseudo Block GMRES", "GMRES",
                        "Block CG", "Pseudo Block CG"):
        st = _find(p, "ThyraSolver", "Linear Solver Types", "Belos",
                   "Solver Types", solver_name)
        if st is not None:
            out["Convergence Tolerance"] = float(
                st.get("Convergence Tolerance", 1e-8))
            out["Maximum Iterations"] = int(st.get("Maximum Iterations", 1000))
            out["Num Blocks"] = int(st.get("Num Blocks", 100))
            out["Solver Type"] = "cg" if "CG" in solver_name else "gmres"
            return
    # already-flat fallbacks
    for k in ("Convergence Tolerance", "Maximum Iterations", "Num Blocks"):
        if k in p:
            out[k] = p[k]


def translate_prec(p: ParameterList, out: ParameterList) -> None:
    fr = _find(p, "ThyraPreconditioner", "Preconditioner Types", "FROSch")
    if fr is None:
        fr = p if "Overlap" in p else None
    if fr is None:
        return
    out["Overlap"] = int(fr.get("Overlap", 1))
    two_level = bool(fr.get("TwoLevel", False))
    out["Preconditioner Type"] = ("SchwarzTwoLevel" if two_level
                                  else "SchwarzOneLevel")
    aoo = fr.get("AlgebraicOverlappingOperator")
    if isinstance(aoo, ParameterList):
        out["Combine Values in Overlap"] = aoo.get(
            "Combine Values in Overlap", "Restricted")
    null_space = fr.get("Null Space Type", "Laplace")
    out["Null Space Type"] = null_space
    # coarse-space family: GDSWCoarseOperator → classic GDSW;
    # RGDSWCoarseOperator → reduced vertex-based space;
    # IPOUHarmonicCoarseOperator → its own operator (precond/gdsw.py
    # ipou_groups) driven by the InterfacePartitionOfUnity sublist
    # (parametersPrec.xml:63-120): POU Type (GDSW | GDSWStar | RGDSW) and
    # the Custom entity toggles (Vertices / Edges / Faces; ShortEdges and
    # StraightEdges fold into Edges — the repo's algebraic classification
    # does not subdivide edge types)
    cot = str(fr.get("CoarseOperator Type", "GDSWCoarseOperator"))
    if "IPOU" in cot:
        out["Coarse Space Variant"] = "IPOUHarmonic"
        ip = _find(fr, "IPOUHarmonicCoarseOperator", "Blocks", "1",
                   "InterfacePartitionOfUnity")
        if isinstance(ip, ParameterList):
            out["IPOU Type"] = str(ip.get("Type", "GDSWStar"))
            custom = _find(ip, "GDSW", "Custom")
            if isinstance(custom, ParameterList):
                out["IPOU Vertices"] = bool(custom.get("Vertices", True))
                out["IPOU Edges"] = bool(custom.get("Edges", True)) or \
                    bool(custom.get("ShortEdges", False)) or \
                    bool(custom.get("StraightEdges", False))
                out["IPOU Faces"] = bool(custom.get("Faces", True))
    else:
        out["Coarse Space Variant"] = "RGDSW" if "RGDSW" in cot else "GDSW"
    out["Level Combination"] = fr.get("Level Combination", "Additive")
    # Distribution sublist (parametersPrec.xml:104-110): NumProcs → the
    # device subset holding the coarse solve ('Coarse NumProcs').
    # GatheringSteps has no analog knob: the coarse psum/all_gather is
    # already a staged tree reduction in the XLA collective schedule.
    dist = _find(fr, cot, "Distribution") or _find(fr, "Distribution")
    if isinstance(dist, ParameterList):
        out["Coarse NumProcs"] = int(dist.get("NumProcs", 1))
    # CoarseSolver sublist: Amesos2/KLU (exact direct) → the batched
    # sparse-LU wavefront solve; Belos (iterative GMRES tol 1e-6) → the
    # fixed-iteration device CG on sparse-ELL A₀ (precond/gdsw.py
    # distributed_two_level coarse_solver)
    # (the ExtensionSolver sublist configures the interior harmonic-
    # extension solve of Φ, NOT the coarse solve — do not read it here)
    cs = _find(fr, cot, "CoarseSolver") or _find(fr, "CoarseSolver")
    if isinstance(cs, ParameterList):
        st = str(cs.get("SolverType", "Amesos2"))
        out["Coarse Solver"] = "iterative" if "Belos" in st else "sparse"


def translate_problem(p: ParameterList, out: ParameterList) -> None:
    par = p.get("Parameter")
    src = par if isinstance(par, ParameterList) else p
    for k, v in src.items():
        if not isinstance(v, ParameterList):
            out[k] = v


def load_reference_configs(problem_xml=None, prec_xml=None,
                           solver_xml=None) -> ParameterList:
    """Merge the three reference config files into one flat feddlib_tpu
    parameter list (mirrors problems/tests/*/main.cpp:91-97)."""
    out = ParameterList("Parameters")
    if problem_xml:
        translate_problem(load_xml_parameters(problem_xml), out)
    if prec_xml:
        translate_prec(load_xml_parameters(prec_xml), out)
    if solver_xml:
        translate_solver(load_xml_parameters(solver_xml), out)
    return out
