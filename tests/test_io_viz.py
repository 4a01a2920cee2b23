"""Checkpoint round-trip and plotting smoke tests."""
import jax.numpy as jnp
import numpy as np

from etol_tpu.core.problem import VGP
from etol_tpu.io import load_checkpoint, save_checkpoint
from etol_tpu import load_configs
from etol_tpu.viz import plot_xy_with_zones, plot_x, plot_u, animate2d


def test_checkpoint_roundtrip_npz(tmp_path):
    tree = {
        "z": jnp.arange(12.0).reshape(3, 4),
        "nested": {"mu": jnp.ones((2, 5)), "it": jnp.asarray(7)},
    }
    p = save_checkpoint(str(tmp_path / "state.npz"), tree)
    back = load_checkpoint(p, tree)
    np.testing.assert_allclose(np.asarray(back["z"]), np.asarray(tree["z"]))
    np.testing.assert_allclose(
        np.asarray(back["nested"]["mu"]), np.ones((2, 5))
    )
    assert int(back["nested"]["it"]) == 7


def test_plots_write_files(tmp_path, mip_xml):
    vgp = load_configs(mip_xml)
    times = jnp.linspace(0.0, 8.0, 17)
    X = jnp.stack(
        [jnp.linspace(1.0, 5.0, 17), jnp.linspace(2.0, 4.0, 17)], axis=-1
    )
    p1 = tmp_path / "xy.png"
    plot_xy_with_zones((times, X), vgp.obstacles, vgp.tracks, save=str(p1))
    assert p1.exists() and p1.stat().st_size > 1000
    p2 = tmp_path / "x.png"
    plot_x((times, X), 0, save=str(p2))
    assert p2.exists()
    p3 = tmp_path / "u.png"
    plot_u((times, X), 1, save=str(p3))
    assert p3.exists()


def test_animate2d_writes(tmp_path, mip_xml):
    vgp = load_configs(mip_xml)
    times = jnp.linspace(0.0, 8.0, 9)
    X = jnp.stack(
        [jnp.linspace(1.0, 5.0, 9), jnp.linspace(2.0, 4.0, 9)], axis=-1
    )
    out = animate2d(
        (times, X),
        vgp.obstacles,
        vgp.tracks,
        save=str(tmp_path / "anim.gif"),
        fps=4,
    )
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000
