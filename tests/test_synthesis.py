"""DiffusersBackend contract test with a mocked Sana PAG pipeline.

The real backend needs downloadable weights (no egress here), so the
integration contract from the reference (generate.py:44-52 pipeline
construction, :799-807 invocation: prompt/height/width/guidance/pag/steps/
seeded generator, LANCZOS resize of the returned frame) is pinned against a
fake `diffusers.SanaPAGPipeline` injected into sys.modules — the only
untested branch left is the actual model download.
"""

import sys
import types

import numpy as np
import pytest
from PIL import Image

from lunaris_orion_tpu.data.prompts import CategoryParams
from lunaris_orion_tpu.data.synthesis import DatasetSynthesizer, pixelate_image


class _FakePipe:
    def __init__(self):
        self.calls = []
        self.to_device = None

    def to(self, device):
        self.to_device = device
        return self

    def __call__(self, **kwargs):
        self.calls.append(kwargs)
        out = types.SimpleNamespace()
        # Return a frame at a DIFFERENT size than requested so the
        # backend's LANCZOS resize is exercised (the reference resizes the
        # pipeline output to the sprite size, generate.py:807-809).
        out.images = [Image.fromarray(
            np.full((512, 512, 3), 128, np.uint8))]
        return out


@pytest.fixture
def fake_diffusers(monkeypatch):
    state = {}

    class SanaPAGPipeline:
        @classmethod
        def from_pretrained(cls, model_id, torch_dtype=None):
            state["model_id"] = model_id
            state["torch_dtype"] = torch_dtype
            state["pipe"] = _FakePipe()
            return state["pipe"]

    mod = types.ModuleType("diffusers")
    mod.SanaPAGPipeline = SanaPAGPipeline
    monkeypatch.setitem(sys.modules, "diffusers", mod)
    return state


class TestDiffusersBackendContract:
    def _backend(self, state):
        from lunaris_orion_tpu.data.synthesis import DiffusersBackend
        return DiffusersBackend(device="cpu")

    def test_pipeline_construction(self, fake_diffusers):
        import torch
        self._backend(fake_diffusers)
        assert fake_diffusers["model_id"] == (
            "Efficient-Large-Model/Sana_600M_512px_diffusers")
        assert fake_diffusers["torch_dtype"] == torch.bfloat16
        assert fake_diffusers["pipe"].to_device == "cpu"

    def test_generate_wires_params_and_seed(self, fake_diffusers):
        backend = self._backend(fake_diffusers)
        params = CategoryParams(pixel_size=8, guidance_scale=7.5,
                                pag_scale=3.0, num_steps=18)
        img = backend.generate("[CATEGORY]character[END]", seed=1234,
                               params=params, image_size=128)
        (call,) = fake_diffusers["pipe"].calls
        assert call["prompt"] == "[CATEGORY]character[END]"
        assert call["height"] == 128 and call["width"] == 128
        assert call["guidance_scale"] == 7.5
        assert call["pag_scale"] == 3.0
        assert call["num_inference_steps"] == 18
        assert call["generator"].initial_seed() == 1234
        # 512px pipeline frame LANCZOS-resized to the sprite size
        assert img.size == (128, 128)

    def test_backend_plugs_into_synthesizer(self, fake_diffusers, tmp_path):
        backend = self._backend(fake_diffusers)
        syn = DatasetSynthesizer(str(tmp_path), backend=backend, seed=0,
                                 save_pngs=False)
        made = syn.generate_batch(3, category="character")
        assert made == 3
        assert len(fake_diffusers["pipe"].calls) == 3
        paths = syn.export(tag="test")
        arr = np.load(paths["sprites"])
        assert arr.shape == (3, 128, 128, 3) and arr.dtype == np.uint8
        # save_pngs=False must not leave an empty images/ dir behind
        assert not (tmp_path / "images").exists()


def test_pixelate_contract():
    """LANCZOS down / quantize<=64 colors / NEAREST up (generate.py:619-637):
    output is blocky at pixel_size granularity with a bounded palette."""
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (128, 128, 3), np.uint8))
    out = pixelate_image(img, pixel_size=8, num_colors=64)
    arr = np.asarray(out)
    assert arr.shape == (128, 128, 3)
    blocks = arr.reshape(16, 8, 16, 8, 3)
    assert (blocks == blocks[:, :1, :, :1]).all()  # 8x8 constant blocks
    assert len(np.unique(arr.reshape(-1, 3), axis=0)) <= 64
