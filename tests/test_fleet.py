"""Multi-vehicle deconfliction tests (BASELINE config 5 capability)."""
import jax.numpy as jnp
import numpy as np

from etol_tpu.core.types import Status
from etol_tpu.models.fleet import fleet_2d, min_pairwise_distance
from etol_tpu.solve import SolverConfig, solve


def test_three_vehicle_crossing_deconflicts():
    vgp, nlp = fleet_2d(n_vehicles=3, d_min=0.5)
    data, dims = vgp.to_device()
    res = solve(nlp, SolverConfig(), data)
    assert int(res.status) == int(Status.SOLVED)
    X, _ = nlp.unpack(res.z)
    # all vehicles reach their goals
    np.testing.assert_allclose(
        np.asarray(X[-1]), np.asarray(data.xf), atol=0.06
    )
    # separation holds at every node (small tolerance for the smooth AL)
    dmin = float(min_pairwise_distance(X, 3))
    assert dmin >= 0.5 - 1e-2
    # without the constraint the crossing paths would collide: straight
    # lines all pass through the circle center
    straight = jnp.stack(
        [
            (1 - w) * data.x0 + w * data.xf
            for w in jnp.linspace(0.0, 1.0, dims.nodes)
        ]
    )
    assert float(min_pairwise_distance(straight, 3)) < 0.3
