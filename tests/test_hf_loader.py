"""Torch-free pytorch_model.bin reading (hf_loader._load_torch_bin).

The reference's native checkpoint format is torch .bin
(examples/inference_gpt2.py:44); these tests save real torch state dicts and
assert the self-contained zipfile+pickle reader round-trips them with the
torch import BLOCKED — deployment of this framework does not need torch.
"""

import builtins
import pickle
import zipfile

import numpy as np
import pytest

from cleantransformer_tpu.utils import hf_loader


def _save_bin(tmp_path, sd):
    import torch
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(sd, path)
    return path


class TestTorchFreeBin:
    def test_roundtrip_dtypes_and_strides(self, tmp_path):
        import torch
        sd = {
            "w.float": torch.randn(3, 5),
            "w.half": torch.randn(2, 4).half(),
            "w.bf16": torch.randn(4, 4).to(torch.bfloat16),
            "ids": torch.arange(7, dtype=torch.int64),
            "flag": torch.tensor([True, False, True]),
            # non-contiguous: stride/offset handling must be exact
            "slice": torch.randn(6, 6)[1:4, ::2],
            "transposed": torch.randn(3, 4).t(),
            "scalar": torch.tensor(2.5),
        }
        path = _save_bin(tmp_path, sd)
        expect = {k: (v.float() if v.dtype in (torch.bfloat16, torch.float16)
                      else v).numpy() for k, v in sd.items()}
        got = hf_loader._load_torch_bin(path)
        assert set(got) == set(expect)
        for k in expect:
            np.testing.assert_array_equal(got[k], expect[k], err_msg=k)
            assert got[k].shape == expect[k].shape

    def test_load_state_dict_without_torch(self, tmp_path):
        import torch
        sd = {"transformer.wte.weight": torch.randn(11, 8),
              "transformer.h.0.ln_1.weight": torch.ones(8)}
        path = _save_bin(tmp_path, sd)
        expect = {k: v.numpy() for k, v in sd.items()}
        # block torch AFTER saving: the zipfile branch must not touch it
        real_import = builtins.__import__

        def guarded(name, *a, **k):
            if name == "torch" or name.startswith("torch."):
                raise ImportError("torch blocked by test")
            return real_import(name, *a, **k)

        builtins.__import__ = guarded
        try:
            got = hf_loader.load_state_dict(path)
        finally:
            builtins.__import__ = real_import
        for k in expect:
            np.testing.assert_array_equal(got[k], expect[k])

    def test_matches_torch_load(self, tmp_path):
        """Oracle check: identical to torch.load on the same file."""
        import torch
        sd = {"a": torch.randn(16, 16).to(torch.bfloat16),
              "b": torch.randn(5)}
        path = _save_bin(tmp_path, sd)
        ours = hf_loader._load_torch_bin(path)
        theirs = torch.load(path, map_location="cpu", weights_only=True)
        for k in theirs:
            ref = theirs[k]
            ref = (ref.float() if ref.dtype in (torch.bfloat16, torch.float16)
                   else ref).numpy()
            np.testing.assert_array_equal(ours[k], ref)

    def test_blocks_arbitrary_globals(self, tmp_path):
        """A pickle smuggling a non-tensor global must be rejected, not run."""
        path = str(tmp_path / "evil.bin")
        with zipfile.ZipFile(path, "w") as z:

            class Evil:
                def __reduce__(self):
                    return (eval, ("1+1",))

            z.writestr("evil/data.pkl", pickle.dumps({"x": Evil()}))
        with pytest.raises(pickle.UnpicklingError):
            hf_loader._load_torch_bin(path)

    def test_gpt_params_via_bin(self, tmp_path):
        """End-to-end: a gpt-shaped .bin feeds the stacked-pytree builder
        with torch blocked after the save."""
        rng = np.random.default_rng(0)
        L, D, V, P = 2, 8, 13, 6
        raw = {"wte.weight": rng.standard_normal((V, D)),
               "wpe.weight": rng.standard_normal((P, D)),
               "ln_f.weight": np.ones(D), "ln_f.bias": np.zeros(D)}
        for i in range(L):
            h = f"h.{i}."
            raw[h + "ln_1.weight"] = np.ones(D)
            raw[h + "ln_1.bias"] = np.zeros(D)
            raw[h + "attn.c_attn.weight"] = rng.standard_normal((D, 3 * D))
            raw[h + "attn.c_attn.bias"] = np.zeros(3 * D)
            raw[h + "attn.c_proj.weight"] = rng.standard_normal((D, D))
            raw[h + "attn.c_proj.bias"] = np.zeros(D)
            raw[h + "ln_2.weight"] = np.ones(D)
            raw[h + "ln_2.bias"] = np.zeros(D)
            raw[h + "mlp.c_fc.weight"] = rng.standard_normal((D, 4 * D))
            raw[h + "mlp.c_fc.bias"] = np.zeros(4 * D)
            raw[h + "mlp.c_proj.weight"] = rng.standard_normal((4 * D, D))
            raw[h + "mlp.c_proj.bias"] = np.zeros(D)
        import torch
        sd = {k: torch.as_tensor(np.asarray(v, dtype=np.float32))
              for k, v in raw.items()}
        path = _save_bin(tmp_path, sd)

        from cleantransformer_tpu.config import GPTConfig
        cfg = GPTConfig(vocab_size=V, n_positions=P, n_embd=D, n_layer=L,
                        n_head=2)
        real_import = builtins.__import__

        def guarded(name, *a, **k):
            if name == "torch" or name.startswith("torch."):
                raise ImportError("torch blocked by test")
            return real_import(name, *a, **k)

        builtins.__import__ = guarded
        try:
            loaded = hf_loader.load_state_dict(path)
            params = hf_loader.gpt_params_from_state_dict(loaded, cfg)
        finally:
            builtins.__import__ = real_import
        np.testing.assert_array_equal(params["tokens_embed"],
                                      raw["wte.weight"].astype(np.float32))
        assert params["blocks"]["attn"]["c_attn"]["w"].shape == (L, D, 3 * D)
