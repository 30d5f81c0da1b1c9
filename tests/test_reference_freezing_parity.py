"""Direct parity of the layer-freezing policy with the REFERENCE'S OWN
``clip_layers`` / ``freeze_model_layers`` (model/model.py:36-82,291-334).

The reference walks torch ``named_parameters()`` of an OpenAI-named CLIP
and flips ``requires_grad``; we classify a pytree and build gradient
masks.  Here the reference code executes on a torch mock with authentic
OpenAI parameter naming, and the resulting requires_grad set is compared
category-for-category (per-layer top-n windows, proj group under
freeze_proj, tokens/other always frozen) against our ``trainable_mask``
on a same-shaped pytree.  Auto-skips without the reference checkout.
"""

import os

import numpy as np
import pytest

REF_MODEL = "/root/reference/debias_clip/model/model.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MODEL), reason="reference checkout not present")

torch = pytest.importorskip("torch")
nn = torch.nn

D = 16
N_TEXT, N_VID = 3, 3


@pytest.fixture(scope="module")
def ref_model_mod():
    import importlib.util
    import sys
    import types

    from debias_vision_lang_tpu.core.config import Dotdict

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("clip", load=None, tokenize=None)
    stub("debias_clip", Dotdict=Dotdict)
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_model2", REF_MODEL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


class _Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.ln_1 = nn.LayerNorm(D)
        self.attn = nn.Linear(D, D)
        self.mlp = nn.Linear(D, D)


class _Transformer(nn.Module):
    def __init__(self, k):
        super().__init__()
        self.resblocks = nn.Sequential(*[_Block() for _ in range(k)])

    def forward(self, x):
        return x


class _Visual(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, D, 4, bias=False)
        self.class_embedding = nn.Parameter(torch.zeros(D))
        self.positional_embedding = nn.Parameter(torch.zeros(5, D))
        self.ln_pre = nn.LayerNorm(D)
        self.transformer = _Transformer(N_VID)
        self.ln_post = nn.LayerNorm(D)
        self.proj = nn.Parameter(torch.zeros(D, D))


class _MockOpenAIClip(nn.Module):
    """Authentic OpenAI CLIP parameter naming, tiny shapes."""

    def __init__(self):
        super().__init__()
        self.token_embedding = nn.Embedding(64, D)
        self.positional_embedding = nn.Parameter(torch.zeros(12, D))
        self.transformer = _Transformer(N_TEXT)
        self.ln_final = nn.LayerNorm(D)
        self.text_projection = nn.Parameter(torch.zeros(D, D))
        self.logit_scale = nn.Parameter(torch.tensor(0.0))
        self.visual = _Visual()


def _reference_grad_map(ref_model_mod, n_text, n_vid, freeze_proj):
    mock = _MockOpenAIClip()
    ref_model_mod.DebiasCLIP(
        clip_model=mock, num_debias_tokens=2, hidden_dim=D, max_tokens=12,
        debias_token_init="zeros", n_train_text_layers=n_text,
        n_train_vid_layers=n_vid, freeze_proj=freeze_proj)
    return {name: p.requires_grad for name, p in mock.named_parameters()}


def _our_mask(n_text, n_vid, freeze_proj):
    import jax

    from debias_vision_lang_tpu.core.config import (CLIPConfig, DebiasConfig,
                                                    TextConfig, VisionConfig)
    from debias_vision_lang_tpu.models.clip import init_clip_params
    from debias_vision_lang_tpu.models.debias import trainable_mask

    cfg = CLIPConfig(
        name="tiny",
        vision=VisionConfig(kind="vit", image_size=32, patch_size=8,
                            width=D * 2, layers=N_VID, heads=2, embed_dim=D),
        text=TextConfig(vocab_size=64, context_length=12, width=D,
                        layers=N_TEXT, heads=2, embed_dim=D),
    )
    params = init_clip_params(jax.random.key(0), cfg)
    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=D,
                        n_train_text_layers=n_text, n_train_vid_layers=n_vid,
                        freeze_proj=freeze_proj)
    return params, trainable_mask(params, dcfg)


def _layer_trains(mask_tree, tower, i):
    leaf = mask_tree[tower]["resblocks"]["ln_1"]["scale"]
    return bool(np.asarray(leaf).ravel()[i] == 1.0)


@pytest.mark.parametrize("freeze_proj", [True, False])
@pytest.mark.parametrize("n_text,n_vid", [(0, 0), (1, 2), (3, 3)])
def test_policy_matches_reference(ref_model_mod, n_text, n_vid, freeze_proj):
    ref = _reference_grad_map(ref_model_mod, n_text, n_vid, freeze_proj)
    _, mask = _our_mask(n_text, n_vid, freeze_proj)

    # per-layer windows: layer i of each tower trains in the reference iff
    # any of its params kept requires_grad
    for i in range(N_TEXT):
        ref_trains = any(v for k, v in ref.items()
                         if k.startswith(f"transformer.resblocks.{i}."))
        assert _layer_trains(mask, "text", i) == ref_trains, ("text", i)
    for i in range(N_VID):
        ref_trains = any(v for k, v in ref.items()
                         if k.startswith(f"visual.transformer.resblocks.{i}."))
        assert _layer_trains(mask, "visual", i) == ref_trains, ("visual", i)

    # proj group
    proj_ours = {
        "ln_final.weight": mask["text"]["ln_final"]["scale"],
        "text_projection": mask["text"]["text_projection"],
        "logit_scale": mask["logit_scale"],
        "visual.ln_post.weight": mask["visual"]["ln_post"]["scale"],
        "visual.proj": mask["visual"]["proj"],
    }
    for ref_name, our_leaf in proj_ours.items():
        assert bool(np.asarray(our_leaf).ravel()[0] == 1.0) == ref[ref_name], \
            ref_name
    # tokens + other: frozen on both sides, regardless of config
    for ref_name, our_leaf in [
        ("token_embedding.weight", mask["text"]["token_embedding"]),
        ("positional_embedding", mask["text"]["positional_embedding"]),
        ("visual.conv1.weight", mask["visual"]["conv1"]["kernel"]
         if isinstance(mask["visual"].get("conv1"), dict)
         else mask["visual"]["conv1"]),
        ("visual.class_embedding", mask["visual"]["class_embedding"]),
    ]:
        leaf = our_leaf
        if isinstance(leaf, dict):  # take any leaf of the subtree
            leaf = next(iter(leaf.values()))
        assert not ref[ref_name]
        assert float(np.asarray(leaf).ravel()[0]) == 0.0, ref_name


def test_range_validation_message_matches(ref_model_mod):
    """Out-of-range n_train_text_layers raises the reference-worded error."""
    with pytest.raises(ValueError) as ref_err:
        _reference_grad_map(ref_model_mod, N_TEXT + 1, 0, True)
    with pytest.raises(ValueError) as our_err:
        _our_mask(N_TEXT + 1, 0, True)
    assert str(our_err.value) == str(ref_err.value)
