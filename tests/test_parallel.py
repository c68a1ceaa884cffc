"""Sharded rendering tests.

Pure-layout tests run in-process; anything needing the 8-device virtual CPU
mesh runs its body in a clean subprocess (``parallel_impl.py``) because the
session's axon sitecustomize freezes jax's device configuration before
pytest's conftest can force the mesh (see conftest docstring).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from minipath_tpu.parallel.mesh import frame_pixel_packets, unpack_frame

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_IMPL = os.path.join(_REPO, "tests", "parallel_impl.py")


def _run_case(case: str, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        [_REPO]
        + [p for p in env.get("PYTHONPATH", "").split(":") if p and ".axon_site" not in p]
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, _IMPL, case],
        env=env,
        cwd=_REPO,
        capture_output=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"case {case} failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout.decode(errors='replace')[-4000:]}\n"
        f"stderr:\n{proc.stderr.decode(errors='replace')[-4000:]}"
    )


def test_eight_devices_available():
    _run_case("devices", timeout=180)


def test_frame_packets_roundtrip():
    w, h = 100, 70  # not packet-aligned
    pixels, counts = frame_pixel_packets(w, h)
    pix = np.asarray(pixels)
    # Each on-screen pixel appears exactly once after unpack.
    vals = np.concatenate([pix, np.zeros(pix.shape[:-1] + (2,), np.float32)], -1)
    img = np.asarray(unpack_frame(vals, w, h, counts))
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_array_equal(img[..., 0], gx)
    np.testing.assert_array_equal(img[..., 1], gy)


def test_padding_to_device_count():
    pixels, _ = frame_pixel_packets(100, 70, pad_packets_to=8)
    assert pixels.shape[0] % 8 == 0


def test_sharded_matches_single_device():
    _run_case("sharded_matches_single")


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_multichip():
    _run_case("graft_multichip")


def test_sharded_pallas_frame_renderer():
    _run_case("sharded_pallas_frame")


def test_machinery_mesh_identical():
    _run_case("machinery_mesh_identical")


def test_sharded_path_tracer():
    _run_case("sharded_pt")


def test_sharded_path_tracer_nee():
    _run_case("sharded_pt_nee")
