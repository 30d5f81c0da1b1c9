"""Direct parity of prompt-injection semantics with the REFERENCE'S OWN
``DebiasCLIP.encode_text`` (model/model.py:199-271).

The injection quirks (learned tokens get no positional embedding, shifted
raw tokens keep pre-shift positions, EOT pooling at argmax+P with the
clamp-truncation edge, per-mode insertion intervals, init semantics) are
checkpoint-compatibility load-bearing.  Until now they were pinned to
hand-derived expectations; here the reference class itself executes on a
torch mock backbone whose transformer is a RECORDING IDENTITY and whose
ln_final/text_projection are identities, so its encode_text output IS the
pooled injected buffer — compared slot-for-slot against our real
``inject_prompts`` / ``debias_eot_index`` / ``init_debias_tokens`` on the
same weights.  Auto-skips without the reference checkout.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/debias_clip"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "model", "model.py")),
    reason="reference checkout not present")

torch = pytest.importorskip("torch")
nn = torch.nn

V, D, S = 50, 16, 12  # vocab (EOT = V-1 max id), width, context


@pytest.fixture(scope="module")
def ref_model_mod():
    """Load the reference model module with its externals stubbed
    (`clip` = the OpenAI package; `debias_clip` package bits)."""
    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    from debias_vision_lang_tpu.core.config import Dotdict

    stub("clip", load=None, tokenize=None, available_models=lambda: [])
    stub("debias_clip", Dotdict=Dotdict)
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_model", os.path.join(REF_DIR, "model", "model.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


class _RecordingIdentity(nn.Module):
    def forward(self, x):
        self.last = x.detach().clone()
        return x


class _MockClip(nn.Module):
    """Minimal ClipLike: identity transformer/ln_final/projection so
    encode_text's output equals the pooled injected buffer."""

    def __init__(self, w_tok: np.ndarray, w_pos: np.ndarray):
        super().__init__()
        self.token_embedding = nn.Embedding(V, D)
        with torch.no_grad():
            self.token_embedding.weight.copy_(torch.from_numpy(w_tok))
        self.positional_embedding = nn.Parameter(torch.from_numpy(w_pos))
        self.transformer = _RecordingIdentity()
        self.ln_final = nn.Identity()
        self.text_projection = nn.Parameter(torch.eye(D))
        self.logit_scale = nn.Parameter(torch.tensor(0.0))


def _weights(seed=0):
    rng = np.random.default_rng(seed)
    w_tok = rng.normal(size=(V, D)).astype(np.float32)
    w_pos = rng.normal(size=(S, D)).astype(np.float32)
    deb = rng.normal(size=(2, D)).astype(np.float32)
    return w_tok, w_pos, deb


def _texts():
    """EOT (= V-1, the max id) at: a normal slot, slot 1 (empty text),
    S-2, and the final slot S-1 — the clamp-truncation quirk."""
    rows = []
    for eot_pos in (3, 1, S - 2, S - 1):
        row = np.zeros(S, np.int64)
        row[0] = V - 2  # SOT stand-in (any non-max id)
        row[1:eot_pos] = 5 + (np.arange(max(0, eot_pos - 1)) % 30)
        row[eot_pos] = V - 1
        rows.append(row)
    return np.stack(rows)


def _ours(w_tok, w_pos, deb, text, mode, p):
    import jax.numpy as jnp

    from debias_vision_lang_tpu.models.clip import (add_positional,
                                                    embed_tokens)
    from debias_vision_lang_tpu.models.debias import (debias_eot_index,
                                                      inject_prompts)

    tp = {"token_embedding": jnp.asarray(w_tok),
          "positional_embedding": jnp.asarray(w_pos)}
    raw = add_positional(tp, embed_tokens(tp, jnp.asarray(text)))
    injected = inject_prompts(raw, jnp.asarray(deb[:p]), jnp.asarray(text),
                              mode)
    idx = debias_eot_index(jnp.asarray(text), p, S)
    pooled = np.asarray(injected)[np.arange(len(text)), np.asarray(idx)]
    return np.asarray(injected), pooled


@pytest.mark.parametrize("mode", ["prepend", "append", "append_after_eos",
                                  "add"])
@pytest.mark.parametrize("p", [2, 0])
def test_injection_and_pooling_match_reference(ref_model_mod, mode, p):
    w_tok, w_pos, deb = _weights()
    mock = _MockClip(w_tok, w_pos)
    ref = ref_model_mod.DebiasCLIP(
        clip_model=mock, num_debias_tokens=p, hidden_dim=D, max_tokens=S,
        debias_token_init="zeros", debias_pos=mode)
    if p:
        with torch.no_grad():
            ref.debias_tokens.weight.copy_(torch.from_numpy(deb[:p]))

    text = _texts()
    out_ref = ref.encode_text(torch.from_numpy(text)).detach().numpy()
    injected_ref = mock.transformer.last.permute(1, 0, 2).numpy()

    injected_ours, pooled_ours = _ours(w_tok, w_pos, deb, text, mode, p)
    np.testing.assert_allclose(injected_ours, injected_ref,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pooled_ours, out_ref, rtol=1e-6, atol=1e-6)


def test_zeros_init_matches_reference(ref_model_mod):
    """'zeros' = embeddings OF TOKEN ID 0, not zero vectors."""
    import jax

    from debias_vision_lang_tpu.core.config import (CLIPConfig, DebiasConfig,
                                                    TextConfig, VisionConfig)
    from debias_vision_lang_tpu.models.debias import init_debias_tokens

    w_tok, w_pos, _ = _weights(1)
    mock = _MockClip(w_tok, w_pos)
    ref = ref_model_mod.DebiasCLIP(
        clip_model=mock, num_debias_tokens=2, hidden_dim=D, max_tokens=S,
        debias_token_init="zeros")
    cfg = DebiasConfig(num_debias_tokens=2, hidden_dim=D,
                       debias_token_init="zeros")
    ours = init_debias_tokens(
        jax.random.key(0), {"text": {"token_embedding": w_tok}}, cfg)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.debias_tokens.weight.detach().numpy(),
                               rtol=0, atol=0)


def test_wordlist_init_matches_reference(ref_model_mod):
    """Word-list init: tokenize the JOINED list once, take ids 1..len."""
    import jax

    from debias_vision_lang_tpu.core.config import DebiasConfig
    from debias_vision_lang_tpu.models.debias import init_debias_tokens

    w_tok, w_pos, _ = _weights(2)

    def fake_ids(texts):
        out = np.zeros((len(texts), S), np.int64)
        for i, t in enumerate(texts):
            words = t.split()
            out[i, 0] = V - 2
            out[i, 1:1 + len(words)] = [7 + (hash(w) % 20) for w in words]
            out[i, 1 + len(words)] = V - 1
        return out

    mock = _MockClip(w_tok, w_pos)
    ref = ref_model_mod.DebiasCLIP(
        clip_model=mock, num_debias_tokens=2, hidden_dim=D, max_tokens=S,
        debias_token_init=["fair", "kind"],
        _tokenizer=lambda texts: torch.from_numpy(fake_ids(texts)))
    cfg = DebiasConfig(num_debias_tokens=2, hidden_dim=D,
                       debias_token_init=("fair", "kind"))
    ours = init_debias_tokens(
        jax.random.key(0), {"text": {"token_embedding": w_tok}}, cfg,
        tokenizer=fake_ids)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.debias_tokens.weight.detach().numpy(),
                               rtol=0, atol=0)


def test_adversary_forward_matches_reference(ref_model_mod):
    """Mirror the reference Adversary's torch weights into our params and
    compare sigmoid(MLP(x)) outputs (model/model.py:337-361)."""
    from debias_vision_lang_tpu.models.adversary import Adversary

    ref = ref_model_mod.Adversary(n_input=10, n_output=3, hidden_size=8)
    ours = Adversary.from_cfg({"ADV_N_INPUT": 10, "ADV_N_OUTPUT": 3,
                               "ADV_HIDDEN_SIZE": 8})
    linears = [m for m in ref.network if isinstance(m, nn.Linear)]
    assert len(linears) == len(ours.params["layers"]) == 4
    new_layers = [
        {"kernel": lin.weight.detach().numpy().T.copy(),
         "bias": lin.bias.detach().numpy().copy()}
        for lin in linears]
    ours = Adversary(params={"layers": new_layers}, cfg=ours.cfg)
    x = np.random.default_rng(4).normal(size=(6, 10)).astype(np.float32)
    out_ref = ref(torch.from_numpy(x)).detach().numpy()
    out_ours = np.asarray(ours(x))
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-6, atol=1e-6)


def test_model_loader_validation_matches_reference(ref_model_mod):
    """Unknown arch name: same exception type, and every arch the
    reference registers is accepted by our loader too.  Documented
    cosmetic divergence: the reference raises a TWO-ARG
    NotImplementedError with a typo ("should be on of..",
    model/model.py:106-108); ours is a single fixed-wording string."""
    from debias_vision_lang_tpu.models.loader import model_loader

    with pytest.raises(NotImplementedError) as ref_err:
        ref_model_mod.model_loader("nonsense")
    with pytest.raises(NotImplementedError) as our_err:
        model_loader("nonsense")
    # reference: args = (message-with-typo, VALID_MODELS)
    assert ref_err.value.args[0] == "nonsense not found, should be on of.."
    ref_names = list(ref_err.value.args[1])
    assert ref_names == list(ref_model_mod.VALID_MODELS)
    our_msg = str(our_err.value)
    assert our_msg.startswith("nonsense not found, should be one of..")
    for name in ref_names:
        assert name in our_msg  # our listing is a superset
    # and the reference's whole registry builds here (SLIP/FiT included
    # elsewhere; the 6 CLIP archs resolve)
    from debias_vision_lang_tpu.core.registry import resolve_arch

    for name in ref_names:
        resolve_arch(name)


@pytest.fixture(scope="module")
def ref_hub_mod(ref_model_mod):
    """Load the reference hub (model/clip.py) with `clip` stubbed and its
    DebiasCLIP import routed to the already-loaded reference model module.
    The module flips ssl's default HTTPS context at import (the documented
    SSL-bypass bug) — saved and restored here."""
    import ssl

    saved_ssl = ssl._create_default_https_context
    clip_stub = types.ModuleType("clip")
    clip_stub.load = None  # set per-test
    stubs = {
        "clip": clip_stub,
        "debias_clip": types.ModuleType("debias_clip"),
        "debias_clip.model": types.ModuleType("debias_clip.model"),
        "debias_clip.model.model": ref_model_mod,
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_hub", os.path.join(REF_DIR, "model", "clip.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        ssl._create_default_https_context = saved_ssl  # undo the bypass
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_reference_loader_consumes_our_pt_export(ref_hub_mod, tmp_path,
                                                 monkeypatch):
    """Round-trip interop: a checkpoint written by OUR exporter
    (models/convert.py::save_debias_prompt_pt) loads through the
    REFERENCE'S OWN hub loader (model/clip.py::load — torch.load +
    DebiasCLIP build + weight swap) with the prompt array intact."""
    from debias_vision_lang_tpu.models.convert import save_debias_prompt_pt

    emb = np.random.default_rng(9).normal(size=(2, D)).astype(np.float32)
    path = str(tmp_path / "ours.pt")
    save_debias_prompt_pt(emb, path)

    w_tok, w_pos, _ = _weights(3)
    mock = _MockClip(w_tok, w_pos)
    monkeypatch.setattr(ref_hub_mod.clip, "load",
                        lambda arch, device=None: (mock, lambda x: x))
    monkeypatch.setattr(ref_hub_mod, "_download",
                        lambda url, root: path)  # registry branch, offline
    model, _pre = ref_hub_mod.load("ViT-B/16-gender", device="cpu")
    np.testing.assert_allclose(
        model.debias_tokens.weight.detach().numpy(), emb, rtol=0, atol=0)


def test_reference_local_path_branch_is_broken(ref_hub_mod, tmp_path,
                                               monkeypatch):
    """Documented reference bug our loader fixes: load(<local path>) hits
    `_MODELS[name]` with the PATH as key (model/clip.py:78-80) → KeyError.
    Pin it so the divergence note stays true; our hub.load handles local
    paths (test_loader_hub.py::TestHub)."""
    from debias_vision_lang_tpu.models.convert import save_debias_prompt_pt

    path = str(tmp_path / "local.pt")
    save_debias_prompt_pt(np.zeros((2, D), np.float32), path)
    monkeypatch.setattr(ref_hub_mod.clip, "load",
                        lambda arch, device=None: (None, None))
    with pytest.raises(KeyError):
        ref_hub_mod.load(path, device="cpu")
