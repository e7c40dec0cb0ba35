"""Utility-layer tests: visualization, profiling, compilation cache, seeding."""

import os

import jax
import numpy as np

from posediffusion_tpu.geometry import PerspectiveCameras
from posediffusion_tpu.utils.cache import enable_compilation_cache
from posediffusion_tpu.utils.profiling import PhaseTimer, device_memory_stats
from posediffusion_tpu.utils.seeding import seed_all_random_engines
from posediffusion_tpu.utils.visualize import plot_cameras


class TestVisualize:
    def test_plot_cameras_writes_figure(self, rng, tmp_path):
        cams = PerspectiveCameras.create(
            R=np.stack([np.eye(3)] * 4),
            T=rng.normal(size=(4, 3)),
            focal_length=np.full((4, 2), 2.0),
        )
        path = plot_cameras({"pred": cams, "gt": cams}, str(tmp_path / "cams.png"))
        assert os.path.exists(path)
        assert os.path.getsize(path) > 1000

    def test_export_scene_html(self, rng, tmp_path):
        """Interactive HTML scene: self-contained (no external refs), all
        template slots filled, frustum JSON embedded per set."""
        from posediffusion_tpu.utils.visualize import export_scene_html

        cams = PerspectiveCameras.create(
            R=np.stack([np.eye(3)] * 4),
            T=rng.normal(size=(4, 3)),
            focal_length=np.full((4, 2), 2.0),
        )
        path = export_scene_html(
            {"pred": cams, "gt": cams}, str(tmp_path / "cams.html")
        )
        html = open(path).read()
        assert "{scene_json}" not in html and "{{" not in html
        assert '"name": "pred"' in html and '"name": "gt"' in html
        assert "http://" not in html and "https://" not in html
        # geometry: 2 sets x 4 cameras x 5 frustum points
        import json as _json

        scene = _json.loads(
            html.split("const SCENE = ")[1].split(";\n")[0]
        )
        assert len(scene["sets"]) == 2
        assert np.asarray(scene["sets"][0]["frusta"]).shape == (4, 5, 3)


class TestProfiling:
    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b", block=False):
            pass
        assert t.counts["a"] == 2 and t.counts["b"] == 1
        summary = t.summary()
        assert "a" in summary and "avg" in summary

    def test_device_memory_stats(self):
        stats = device_memory_stats()
        assert len(stats) == len(jax.devices())


class TestCache:
    def test_enable_compilation_cache(self, tmp_path):
        d = enable_compilation_cache(str(tmp_path / "xla"))
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d


class TestSeeding:
    def test_seed_reproducible(self):
        seed_all_random_engines(7)
        a = np.random.rand(3)
        seed_all_random_engines(7)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)
