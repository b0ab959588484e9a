"""Image IO, checkpointing, guards, logging, CLI."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.io.image import (read_ppm, to_uint8,
                                                     write_ppm, write_image)
from ray_tracer_fragment_shader_tpu.utils.checkpoint import (restore_checkpoint,
                                                             save_checkpoint)
from ray_tracer_fragment_shader_tpu.utils.guards import assert_finite
from ray_tracer_fragment_shader_tpu.utils.logging import JsonlLogger


def test_ppm_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(8, 6, 3)
    path = str(tmp_path / "x.ppm")
    write_ppm(path, img)
    back = read_ppm(path)
    assert back.shape == (8, 6, 3)
    np.testing.assert_array_equal(back, to_uint8(img))


def test_ppm_p3_ascii_and_reference_header(tmp_path):
    """P3 (ASCII) parsing with comments, and the reference writer's own
    one-line `P6 w h 255` header (Hw4/ppm.cpp:21 writes exactly that)."""
    rs = np.random.RandomState(1)
    raster = rs.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
    p3 = tmp_path / "a.ppm"
    body = " ".join(str(v) for v in raster.reshape(-1))
    p3.write_text("P3\n# a comment\n5 4 # trailing comment\n255\n"
                  + body + "\n")
    np.testing.assert_array_equal(read_ppm(str(p3)), raster)

    p6 = tmp_path / "b.ppm"
    with open(p6, "wb") as f:   # the reference writer's header shape
        f.write(b"P6 5 4 255\n" + raster.tobytes())
    np.testing.assert_array_equal(read_ppm(str(p6)), raster)

    with pytest.raises(ValueError):
        bad = tmp_path / "c.ppm"
        bad.write_bytes(b"P5 1 1 255\n\x00")
        read_ppm(str(bad))

    # truncated file ending inside a comment must raise, not hang
    with pytest.raises(ValueError, match="end of file"):
        trunc = tmp_path / "d.ppm"
        trunc.write_bytes(b"P3\n1 1\n255\n1 2 # truncated")
        read_ppm(str(trunc))

    # CRLF-written P6 header: the stray \n of "255\r\n" must not become a
    # raster byte...
    crlf = tmp_path / "e.ppm"
    crlf.write_bytes(b"P6\r\n5 4\r\n255\r\n" + raster.tobytes())
    np.testing.assert_array_equal(read_ppm(str(crlf)), raster)
    # ...while a legitimate first raster byte of 10 after "255\n" survives
    r10 = raster.copy()
    r10.reshape(-1)[0] = 10
    lf = tmp_path / "f.ppm"
    lf.write_bytes(b"P6\n5 4\n255\n" + r10.tobytes())
    np.testing.assert_array_equal(read_ppm(str(lf)), r10)


def test_to_uint8_clamps_and_flips():
    img = np.zeros((2, 1, 3))
    img[0, 0] = [2.0, -1.0, 0.5]  # bottom scanline (GL coords)
    out = to_uint8(img)
    # flipped: bottom scanline becomes last raster row; clamped to [0,255]
    np.testing.assert_array_equal(out[1, 0], [255, 0, 128])


def test_write_image_npy(tmp_path):
    img = np.random.rand(4, 4, 3).astype(np.float32)
    p = str(tmp_path / "x.npy")
    write_image(p, img)
    np.testing.assert_array_equal(np.load(p), img)


def test_checkpoint_roundtrip(tmp_path):
    from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
    from ray_tracer_fragment_shader_tpu.scene import presets
    scene, _, _ = presets.fit_target(size=8)
    params = FitParams.from_scene(scene)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params)
    restored = restore_checkpoint(path, params)
    np.testing.assert_array_equal(np.asarray(restored.sph_center),
                                  np.asarray(params.sph_center))


def test_checkpoint_roundtrip_orbax(tmp_path):
    from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
    from ray_tracer_fragment_shader_tpu.scene import presets
    from ray_tracer_fragment_shader_tpu.utils.checkpoint import (
        restore_checkpoint_orbax, save_checkpoint_orbax)
    scene, _, _ = presets.fit_target(size=8)
    params = FitParams.from_scene(scene)
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, params)
    restored = restore_checkpoint_orbax(path, params)
    np.testing.assert_array_equal(np.asarray(restored.sph_center),
                                  np.asarray(params.sph_center))
    np.testing.assert_array_equal(np.asarray(restored.light_pos),
                                  np.asarray(params.light_pos))


def test_concat_scenes_renders_both_halves():
    """concat_scenes merges primitives/materials/lights with re-based ids:
    the merged render equals the builder-composed equivalent."""
    import jax
    from ray_tracer_fragment_shader_tpu.core.renderer import render_image
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.scene import Material, SceneBuilder
    from ray_tracer_fragment_shader_tpu.scene.flat import concat_scenes
    from ray_tracer_fragment_shader_tpu.scene.presets import _cam

    red = Material(ambient=(0.05, 0.0, 0.0), diffuse=(0.6, 0.1, 0.1),
                   specular=(0.3, 0.3, 0.3))
    a = (SceneBuilder().add_checkerboard().add_sphere("c3")
         .add_light("b6").build())
    b = (SceneBuilder(scene_radius=None).add_sphere("f5", material=red)
         .add_cube("a7").build())
    merged = concat_scenes(a, b)
    combined = (SceneBuilder().add_checkerboard().add_sphere("c3")
                .add_light("b6").add_sphere("f5", material=red)
                .add_cube("a7").build())

    from ray_tracer_fragment_shader_tpu.config import RenderConfig
    cfg = RenderConfig(width=32, height=32, max_depth=1, samples=1)
    cam = Camera.from_config(_cam(32), 32, 32)
    img_m = np.asarray(render_image(merged, cam, cfg))
    img_c = np.asarray(render_image(combined, cam, cfg))
    np.testing.assert_allclose(img_m, img_c, atol=1e-5)
    # sanity: the merged additions are actually visible
    base = np.asarray(render_image(a, cam, cfg))
    assert np.abs(img_m - base).max() > 1e-3


def test_assert_finite_raises():
    with pytest.raises(FloatingPointError):
        assert_finite({"x": np.array([1.0, np.nan])})
    assert_finite({"x": np.array([1.0, 2.0])})  # no raise


def test_jsonl_logger(tmp_path):
    p = str(tmp_path / "log.jsonl")
    with JsonlLogger(path=p) as log:
        log.log({"step": 1, "loss": 0.5})
        log.log({"step": 2, "loss": 0.25})
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["step"] == 1 and lines[1]["loss"] == 0.25
    assert "t" in lines[0]


def test_cli_render_and_interactive(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = str(tmp_path / "r.ppm")
    r = subprocess.run(
        [sys.executable, "-m", "ray_tracer_fragment_shader_tpu.cli", "render",
         "--preset", "single_sphere", "--size", "32", "--cpu", "--out", out],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)

    out2 = str(tmp_path / "i.ppm")
    r = subprocess.run(
        [sys.executable, "-m", "ray_tracer_fragment_shader_tpu.cli",
         "interactive", "--size", "24", "--depth", "1", "--cpu", "--out", out2],
        input="d\nc4\nyes\na\nb6\nno\n",
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out2)
    assert "sphere" in r.stdout


def test_checked_render_clean():
    import jax
    from ray_tracer_fragment_shader_tpu.core.renderer import render_image
    from ray_tracer_fragment_shader_tpu.scene import presets
    from ray_tracer_fragment_shader_tpu.utils.guards import checked_render
    scene, cam, cfg = presets.single_sphere(size=16)
    out = checked_render(render_image, scene, cam, cfg)
    assert np.isfinite(np.asarray(out)).all()
