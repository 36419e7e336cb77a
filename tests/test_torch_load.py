"""Tests for the pure-Python torch.save reader (utils/torch_load.py) and
the torch-free RE10K preprocessing path (process_data.py).

The fixture builds a byte-exact torch ZIP archive by hand: a fake `torch`
module is injected only so pickle can emit the `torch.FloatStorage` /
`torch._utils._rebuild_tensor_v2` GLOBAL opcodes the real torch.save
writes; the reader under test never imports torch.
"""

import io
import os
import pickle
import sys
import types
import zipfile

import numpy as np
import pytest


class _FakeStorage:
    """Pickles as a persistent id, exactly like a real torch storage."""

    def __init__(self, key, cls_name, array):
        self.key = key
        self.cls_name = cls_name
        self.array = array


def _install_fake_torch():
    torch_mod = types.ModuleType("torch")
    utils_mod = types.ModuleType("torch._utils")

    def make_cls(name):
        cls = type(name, (), {})
        cls.__module__ = "torch"
        cls.__qualname__ = name
        return cls

    for n in ("FloatStorage", "ByteStorage", "LongStorage", "HalfStorage",
              "BoolStorage", "IntStorage", "DoubleStorage"):
        setattr(torch_mod, n, make_cls(n))

    def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad,
                           hooks, metadata=None):
        raise RuntimeError("only for pickling")  # pragma: no cover
    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    utils_mod._rebuild_tensor_v2 = _rebuild_tensor_v2
    torch_mod._utils = utils_mod
    sys.modules["torch"] = torch_mod
    sys.modules["torch._utils"] = utils_mod
    return torch_mod, utils_mod


class _FakeTensor:
    """Reduces to _rebuild_tensor_v2(storage, ...) like a real tensor."""

    def __init__(self, storage, shape, stride):
        self.storage = storage
        self.shape = shape
        self.stride = stride

    def __reduce__(self):
        return (sys.modules["torch._utils"]._rebuild_tensor_v2,
                (self.storage, 0, tuple(self.shape), tuple(self.stride),
                 False, {}))


class _Pickler(pickle.Pickler):

    def persistent_id(self, obj):
        if isinstance(obj, _FakeStorage):
            cls = getattr(sys.modules["torch"], obj.cls_name)
            return ("storage", cls, obj.key, "cpu", int(obj.array.size))
        return None


def save_torch_zip(path, obj, storages):
    """Writes obj in the torch>=1.6 zip layout: archive/data.pkl +
    archive/data/<key> raw buffers."""
    buf = io.BytesIO()
    _Pickler(buf, protocol=2).dump(obj)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        for st in storages:
            zf.writestr(f"archive/data/{st.key}", st.array.tobytes())


@pytest.fixture()
def fake_torch():
    had = {k: sys.modules.get(k) for k in ("torch", "torch._utils")}
    _install_fake_torch()
    yield
    for k, v in had.items():
        if v is None:
            sys.modules.pop(k, None)
        else:  # pragma: no cover
            sys.modules[k] = v


def _strided_case():
    base = np.arange(24, dtype=np.float32)
    st = _FakeStorage("0", "FloatStorage", base)
    # transposed (non-contiguous) view: shape (3, 4), element stride (1, 6)
    tens = _FakeTensor(st, (3, 4), (1, 6))
    expect = base.reshape(4, 6)[:, :3].T.copy()
    return st, tens, expect


def test_roundtrip_tensors(tmp_path, fake_torch):
    from open_diffusiongs_tpu.utils.torch_load import torch_load
    rng = np.random.default_rng(0)
    f32 = rng.normal(size=(2, 3)).astype(np.float32)
    u8 = rng.integers(0, 255, size=(17,), dtype=np.uint8)
    i64 = rng.integers(-5, 5, size=(4, 2), dtype=np.int64)
    st1 = _FakeStorage("0", "FloatStorage", f32.reshape(-1))
    st2 = _FakeStorage("1", "ByteStorage", u8)
    st3 = _FakeStorage("2", "LongStorage", i64.reshape(-1))
    st4, strided, expect = _strided_case()
    st4.key = "3"
    obj = {
        "a": _FakeTensor(st1, f32.shape, (3, 1)),
        "b": [_FakeTensor(st2, u8.shape, (1,))],
        "c": {"deep": _FakeTensor(st3, i64.shape, (2, 1))},
        "strided": strided,
        "plain": ["str", 3, 4.5, None, True],
    }
    p = str(tmp_path / "chunk.torch")
    save_torch_zip(p, obj, [st1, st2, st3, st4])

    # the reader must work WITHOUT the fake torch present
    for k in ("torch", "torch._utils"):
        sys.modules.pop(k, None)
    out = torch_load(p)
    np.testing.assert_array_equal(out["a"], f32)
    np.testing.assert_array_equal(out["b"][0], u8)
    np.testing.assert_array_equal(out["c"]["deep"], i64)
    np.testing.assert_array_equal(out["strided"], expect)
    assert out["plain"] == ["str", 3, 4.5, None, True]


def test_legacy_format_raises(tmp_path):
    from open_diffusiongs_tpu.utils.torch_load import torch_load
    p = str(tmp_path / "legacy.torch")
    with open(p, "wb") as f:
        f.write(pickle.dumps({"x": 1}))
    with pytest.raises(NotImplementedError):
        torch_load(p)


def test_process_data_torch_free(tmp_path, fake_torch):
    """End-to-end: a synthetic pixelSplat chunk -> PNGs + metadata JSONs +
    full_list.txt, with no real torch installed."""
    from PIL import Image

    import process_data

    # two scenes, two frames each; images are JPEG bytes as uint8 tensors
    rng = np.random.default_rng(0)
    storages, scenes = [], []
    key_counter = [0]

    def add_storage(cls_name, arr):
        st = _FakeStorage(str(key_counter[0]), cls_name, arr)
        key_counter[0] += 1
        storages.append(st)
        return st

    for s in range(2):
        images = []
        for i in range(2):
            img = (rng.uniform(0, 255, (16, 24, 3))).astype(np.uint8)
            bio = io.BytesIO()
            Image.fromarray(img).save(bio, format="JPEG")
            raw = np.frombuffer(bio.getvalue(), np.uint8)
            st = add_storage("ByteStorage", raw)
            images.append(_FakeTensor(st, raw.shape, (1,)))
        cams = rng.normal(size=(2, 18)).astype(np.float32)
        cams[:, :4] = [[0.8, 0.9, 0.5, 0.5], [0.7, 0.8, 0.5, 0.5]]
        cst = add_storage("FloatStorage", cams.reshape(-1))
        scenes.append({
            "key": f"scene{s:03d}",
            "images": images,
            "cameras": _FakeTensor(cst, cams.shape, (18, 1)),
        })

    chunk_dir = tmp_path / "in"
    chunk_dir.mkdir()
    save_torch_zip(str(chunk_dir / "000000.torch"), scenes, storages)

    # Force the torch-free path even though the test image ships torch:
    # None in sys.modules makes `import torch` raise ImportError instead of
    # re-importing real torch (whose re-init in a process that already
    # loaded it fails with TORCH_LIBRARY re-registration errors).
    for k in ("torch", "torch._utils"):
        sys.modules[k] = None
    out_dir = str(tmp_path / "out")
    ok = process_data.process_torch_file(str(chunk_dir / "000000.torch"),
                                         out_dir)
    assert ok
    for s in range(2):
        meta = os.path.join(out_dir, "metadata", f"scene{s:03d}.json")
        assert os.path.exists(meta)
        import json
        frames = json.load(open(meta))["frames"]
        assert len(frames) == 2
        assert os.path.exists(frames[0]["image_path"])
        # fx scaled by width (24), fy by height (16)
        assert abs(frames[0]["fxfycxcy"][0] - 0.8 * 24) < 1e-4
        assert abs(frames[0]["fxfycxcy"][1] - 0.9 * 16) < 1e-4
        w2c = np.asarray(frames[0]["w2c"])
        assert w2c.shape == (4, 4)
        np.testing.assert_allclose(w2c[3], [0, 0, 0, 1])
    lst = process_data.generate_full_list(
        os.path.join(out_dir, "metadata"), out_dir)
    assert len(open(lst).read().strip().splitlines()) == 2


def test_eval_cli_reads_reference_pt_dumps(tmp_path, fake_torch):
    """eval_scene_result.py must score reference-style torch.save eval
    packages ({'render_images', 'image'} .pt files) without torch."""
    import json
    import subprocess

    rng = np.random.default_rng(0)
    storages = []
    render = rng.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32)
    gt = np.clip(render + rng.normal(0, 0.05, render.shape), 0, 1) \
        .astype(np.float32)
    st_r = _FakeStorage("0", "FloatStorage", render.reshape(-1))
    st_g = _FakeStorage("1", "FloatStorage", gt.reshape(-1))

    def strides(a):
        return tuple(s // a.itemsize for s in a.strides)

    pkg = {"render_images": _FakeTensor(st_r, render.shape, strides(render)),
           "image": _FakeTensor(st_g, gt.shape, strides(gt))}
    d = tmp_path / "save"
    d.mkdir()
    save_torch_zip(str(d / "scene0.pt"), pkg, [st_r, st_g])

    for k in ("torch", "torch._utils"):
        sys.modules.pop(k, None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "eval_scene_result.py", "--result_dir", str(d),
         "--platform", "cpu"], cwd=repo, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    result = json.load(open(d / "eval_result.json"))
    assert result["num_scenes"] == 1 and result["num_views"] == 2
    assert 10 < result["psnr"] < 50


def test_convert_ckpt_cli_torch_free(tmp_path, fake_torch):
    """tools/convert_reference_ckpt.py must convert a torch.save .ckpt
    (Lightning layout: {'state_dict': {...}}) without torch installed."""
    import subprocess

    rng = np.random.default_rng(0)
    d = 8
    names_shapes = {
        "shape_model.t_embedder.mlp.0.weight": (d, 256),
        "shape_model.t_embedder.mlp.0.bias": (d,),
        "shape_model.gaussians_pos_embedding": (2, d),
    }
    storages, sd = [], {}
    for i, (name, shape) in enumerate(names_shapes.items()):
        arr = rng.normal(size=shape).astype(np.float32)
        st = _FakeStorage(str(i), "FloatStorage", arr.reshape(-1))
        storages.append(st)
        stride = tuple(int(s) // arr.itemsize for s in arr.strides)
        sd[name] = _FakeTensor(st, shape, stride)
    ckpt_path = str(tmp_path / "model.ckpt")
    save_torch_zip(ckpt_path, {"state_dict": sd, "global_step": 1000},
                   storages)

    for k in ("torch", "torch._utils"):
        sys.modules.pop(k, None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "w.npz")
    r = subprocess.run(
        [sys.executable, "tools/convert_reference_ckpt.py",
         "--ckpt", ckpt_path, "--out", out], cwd=repo,
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    data = dict(np.load(out))
    # kernel transposed torch [out, in] -> flax [in, out]
    key = [k for k in data if "mlp_0" in k and "kernel" in k]
    assert key and data[key[0]].shape == (256, d)


def test_malicious_pickle_gadget_rejected(tmp_path):
    """A .pt carrying a classic REDUCE gadget (os.system) must be refused
    by the safelist, not executed (these files are downloaded third-party
    artifacts; mirrors torch.load(weights_only=True) semantics)."""
    from open_diffusiongs_tpu.utils.torch_load import torch_load

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned > " + str(tmp_path / "pwn"),))

    buf = io.BytesIO()
    pickle.Pickler(buf, protocol=2).dump({"weights": Evil()})
    path = tmp_path / "evil.pt"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
    with pytest.raises(NotImplementedError, match="safelist"):
        torch_load(str(path))
    assert not (tmp_path / "pwn").exists()


def test_stdlib_container_gadgets_rejected(tmp_path):
    """Even innocent-looking non-safelisted stdlib globals are refused
    (functools.partial is a known gadget building block)."""
    import functools

    from open_diffusiongs_tpu.utils.torch_load import torch_load

    buf = io.BytesIO()
    pickle.Pickler(buf, protocol=2).dump(functools.partial(print, "x"))
    path = tmp_path / "partial.pt"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
    with pytest.raises(NotImplementedError, match="safelist"):
        torch_load(str(path))


def test_download_scene_ckpt_offline_flow(tmp_path, fake_torch):
    """download_scene_ckpt.py --ckpt (the zero-egress path) converts a
    reference .ckpt via the torch-free reader; without --ckpt and without
    huggingface_hub it exits with clear instructions."""
    import subprocess

    rng = np.random.default_rng(0)
    arr = rng.normal(size=(8, 256)).astype(np.float32)
    st = _FakeStorage("0", "FloatStorage", arr.reshape(-1))
    sd = {"shape_model.t_embedder.mlp.0.weight": _FakeTensor(
        st, arr.shape, (256, 1))}
    ckpt_path = str(tmp_path / "scene.ckpt")
    save_torch_zip(ckpt_path, {"state_dict": sd}, [st])
    for k in ("torch", "torch._utils"):
        sys.modules.pop(k, None)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "ckpts")
    r = subprocess.run(
        [sys.executable, "download_scene_ckpt.py", "--ckpt", ckpt_path,
         "--out", out, "--convert-only"], cwd=repo,
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "converted_weights.npz"))
