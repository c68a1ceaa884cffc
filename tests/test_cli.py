"""End-to-end CLI tests: both integrators produce a PNG through main().

The reference CLI has no tests (SURVEY.md §4) and never saves its image
(`cli.rs:44-46`); this front-end does, so the saved artifact is asserted.
"""

import numpy as np
import pytest

from minipath_tpu.cli import main
from minipath_tpu.utils.image import load_png


def test_cli_parity_render(tmp_path):
    out = tmp_path / "parity.png"
    rc = main([
        "--width", "64", "--height", "48", "--spp", "2",
        "--tile-size", "32", "--no-stats", "--quiet",
        "--output", str(out),
    ])
    assert rc == 0
    img = load_png(out)
    assert img.shape == (48, 64, 4)
    # Teapot silhouette: some hit, some miss.
    assert 0.05 < (img[..., 3] > 0).mean() < 0.95


def test_cli_pt_render(tmp_path):
    out = tmp_path / "pt.png"
    rc = main([
        "--integrator", "pt", "--width", "48", "--height", "32",
        "--spp", "1", "--bounces", "2", "--no-stats", "--quiet",
        "--output", str(out),
    ])
    assert rc == 0
    img = load_png(out)
    assert img.shape == (32, 48, 4)
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 10  # sky-lit scene is bright


def test_cli_pt_extras(tmp_path):
    # The production extras compose: denoise (variance-guided), AOVs,
    # and the firefly clamp, all through main() on a tiny frame.
    out = tmp_path / "pt_extra.png"
    rc = main([
        "--integrator", "pt", "--scene", "sphere-mesh",
        "--width", "48", "--height", "32",
        "--spp", "2", "--bounces", "2", "--no-stats", "--quiet",
        "--denoise", "--clamp", "4.0", "--aov", str(tmp_path / "aov"),
        "--output", str(out),
    ])
    assert rc == 0
    img = load_png(out)
    assert img.shape == (32, 48, 4) and np.isfinite(img).all()
    n = load_png(tmp_path / "aov_normal.png")
    z = load_png(tmp_path / "aov_depth.png")
    assert n.shape == (32, 48, 4) and z.shape == (32, 48, 4)
    assert (n[..., 3] > 0).any() and not (n[..., 3] > 0).all()


def test_cli_adaptive(tmp_path):
    out = tmp_path / "pt_adaptive.png"
    rc = main([
        "--integrator", "pt", "--scene", "sphere-mesh",
        "--width", "48", "--height", "32",
        "--spp", "10", "--bounces", "2", "--no-stats", "--quiet",
        "--adaptive",
        "--output", str(out),
    ])
    assert rc == 0
    img = load_png(out)
    assert img.shape == (32, 48, 4) and np.isfinite(img).all()
    assert img[..., :3].mean() > 10


def test_cli_bad_obj_errors(tmp_path):
    from minipath_tpu.scene.obj_loader import ObjOpenError

    with pytest.raises(ObjOpenError):
        main([
            "--obj", str(tmp_path / "missing.obj"),
            "--width", "16", "--height", "16", "--spp", "1",
            "--no-stats", "--quiet",
            "--output", str(tmp_path / "x.png"),
        ])
