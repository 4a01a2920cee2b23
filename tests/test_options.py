"""Reference solver-option surface translation (solve/options.py).

The reference tunes ePSOPT through PSOPT algorithm fields
(ePSOPT.cpp:62-72, etol_psopt_example1.cpp:86-99) and eDymos through
IPOPT/pyOptSparse settings (eDymos.cpp:409-441); these tests check the
union dialect lands on the native SolverConfig with honest reporting of
unmapped keys."""
from etol_tpu.solve import SolverConfig, nlp_config
from etol_tpu.optimizer import TrajectoryOptimizer


def test_psopt_algorithm_fields():
    cfg, hints = nlp_config(
        {
            "nlp_tolerance": 1e-6,
            "nlp_iter_max_count": 200,
            "collocation_method": "Legendre",
            "hessian": "exact",
            "mesh_refinement": True,
        }
    )
    # f32 floors the tolerance pair
    assert cfg.tol_cons == 1e-4
    assert cfg.tol_stat == 5e-4
    assert cfg.max_inner == 200
    assert cfg.hessian == "full"
    assert hints["scheme"] == "hermite_simpson"
    assert hints["refine_levels"] >= 1
    assert hints["ignored"] == []


def test_ipopt_and_dymos_fields():
    cfg, hints = nlp_config(
        {
            "optimizer": "SNOPT",
            "tol": 1e-3,
            "max_iter": 500,
            "mu_init": 0.01,
            "transcription": "radau",
            "transcription_order": 3,
            "refine_iteration_limit": 2,
            "print_level": 5,
        }
    )
    assert cfg.tol_cons == 1e-3
    assert cfg.max_inner == 500
    assert cfg.rho0 == 100.0  # 1/mu_init
    assert hints["optimizer"] == "SNOPT"
    # eDymos Radau order-3 transcription -> the native Radau IIA scheme
    assert hints["scheme"] == "radau"
    assert hints["refine_levels"] == 2
    assert "print_level" in hints["ignored"]


def test_unknown_keys_recorded_not_fatal():
    base = SolverConfig(max_outer=7)
    cfg, hints = nlp_config({"wibble": 1, "linear_solver": "ma57"}, base)
    assert cfg.max_outer == 7  # base preserved
    assert set(hints["ignored"]) == {"wibble", "linear_solver"}


def test_facade_set_solver_options_and_optimizer():
    opt = TrajectoryOptimizer()
    hints = opt.set_solver_options(
        {"tol": 1e-2, "transcription": "trapezoidal", "max_iter": 77}
    )
    assert opt.config.max_inner == 77
    assert opt._scheme == "trapezoidal"
    assert hints["scheme"] == "trapezoidal"
    opt.set_optimizer("IPOPT")
    assert opt._solver_hints["optimizer"] == "IPOPT"
