"""Load reference (PyTorch) modules for golden parity tests.

The reference repo at /root/reference is importable piecemeal: the torch model
component files (croco/models/blocks.py, pos_embed.py, dpt_block.py,
dust3r/patch_embed.py, dust3r/heads/*) depend only on torch/numpy/einops.
We import them read-only to generate golden outputs — the JAX implementation is
written independently and compared against these at fp32.
"""

import importlib
import importlib.machinery
import sys
import types

REF_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    if getattr(mod, "__spec__", None) is None:
        # a None __spec__ breaks later importlib.util.find_spec(name) callers
        # (e.g. transformers' optional-dependency probing does
        # find_spec("rich"), which raises ValueError on spec-less modules)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


def install_ref_stubs() -> None:
    """Stub the training-infra deps the reference imports at module scope
    (hydra/lightning/rich/omegaconf/torchvision) so its torch *model* code can
    be imported for golden-output generation without those packages."""

    class _Passthrough:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x, *a, **k):
            return x

    class DictConfig(dict):
        pass

    class OmegaConf:
        @staticmethod
        def to_container(x, **kw):
            return dict(x)

    def rank_zero_only(fn):
        fn.rank = 0
        return fn

    _stub("omegaconf", DictConfig=DictConfig, OmegaConf=OmegaConf,
          open_dict=_Passthrough)

    # functional ToTensor/Normalize/Compose so reference load_images works
    import numpy as _np
    import torch as _torch

    class ToTensor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, pic):
            arr = _np.asarray(pic, dtype=_np.float32) / 255.0
            return _torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std, *a, **k):
            self.mean = _torch.tensor(mean).view(-1, 1, 1)
            self.std = _torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tvt = _stub("torchvision.transforms", ToTensor=ToTensor,
                Normalize=Normalize, Compose=Compose,
                ColorJitter=_Passthrough, ToPILImage=_Passthrough,
                Resize=_Passthrough, CenterCrop=_Passthrough)
    _stub("torchvision", transforms=tvt)
    _stub("hydra", main=lambda **kw: (lambda f: f))
    _stub("hydra.core")
    _stub("hydra.core.hydra_config", HydraConfig=object)
    _stub("hydra.utils", instantiate=lambda *a, **k: None)
    _stub("lightning", Callback=object, LightningModule=object,
          LightningDataModule=object)
    _stub("lightning.pytorch")
    _stub("lightning.pytorch.loggers", Logger=object)
    _stub("lightning.pytorch.utilities")
    _stub("lightning.pytorch.utilities.deepspeed",
          convert_zero_checkpoint_to_fp32_state_dict=lambda *a, **k: None)
    _stub("lightning_utilities")
    _stub("lightning_utilities.core")
    _stub("lightning_utilities.core.rank_zero",
          rank_prefixed_message=lambda msg, rank: msg,
          rank_zero_only=rank_zero_only)
    rich = _stub("rich", print=print)
    _stub("rich.syntax", Syntax=object)
    _stub("rich.tree", Tree=object)
    _stub("rich.prompt", Prompt=object)
    rich.syntax = sys.modules["rich.syntax"]
    rich.tree = sys.modules["rich.tree"]


def ref_module(name: str):
    """Import e.g. 'fast3r.croco.models.blocks' from the reference repo."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    install_ref_stubs()
    return importlib.import_module(name)


def build_ref_vit_block(torch, dim, num_heads, qkv_bias=True, rope=None,
                        ln_eps=1e-6, attn_bias_for_inference_enabled=False,
                        drop=0.0, attn_drop=0.0, drop_path=0.0):
    """Construct a reference Block with given layer-norm eps."""
    import functools

    blocks = ref_module("fast3r.croco.models.blocks")
    norm_layer = functools.partial(torch.nn.LayerNorm, eps=ln_eps)
    return blocks.Block(
        dim=dim, num_heads=num_heads, qkv_bias=qkv_bias, norm_layer=norm_layer,
        rope=rope, attn_implementation="pytorch_naive",
        attn_bias_for_inference_enabled=attn_bias_for_inference_enabled,
        drop=drop, attn_drop=attn_drop, drop_path=drop_path,
    )


def load_linear(tmod, p):
    """Copy jax linear params {'w': (in,out), 'b': (out,)} into torch Linear."""
    import numpy as np
    import torch

    tmod.weight.data = torch.from_numpy(np.asarray(p["w"]).T.copy())
    if "b" in p and tmod.bias is not None:
        tmod.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def load_ln(tmod, p):
    import numpy as np
    import torch

    tmod.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    tmod.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def load_conv(tmod, p):
    import numpy as np
    import torch

    tmod.weight.data = torch.from_numpy(
        np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()
    )
    if "b" in p and tmod.bias is not None:
        tmod.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def load_block(tblock, jblock):
    """Copy one layer's jax block params into a reference torch Block."""
    load_ln(tblock.norm1, jblock["norm1"])
    load_linear(tblock.attn.qkv, jblock["attn"]["qkv"])
    load_linear(tblock.attn.proj, jblock["attn"]["proj"])
    load_ln(tblock.norm2, jblock["norm2"])
    load_linear(tblock.mlp.fc1, jblock["mlp"]["fc1"])
    load_linear(tblock.mlp.fc2, jblock["mlp"]["fc2"])


def slice_layer(stacked, i):
    import jax

    return jax.tree.map(lambda a: a[i], stacked)
