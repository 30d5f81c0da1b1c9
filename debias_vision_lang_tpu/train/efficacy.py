"""Trainer-efficacy experiment: prove the adversarial loop REDUCES bias.

The product claim of the reference framework (README.md:148-157, and the
shipped ``best_ndkl…`` checkpoint, model/clip.py:16) is that adversarial
prompt tuning lowers measured ranking bias (NDKL / MaxSkew) of a CLIP-like
model while keeping image–text alignment intact (ImageNet 68.1% → 67.6%,
README.md:32-36).  The real-data replication of that table is network-gated
(NETWORK_PROBE.md); this module is the OFFLINE proof: a synthetic world with
a *plantable, known* bias, a tiny CLIP pretrained on it until the bias is
measurable, then ``train.loop.run_training`` end-to-end and a before/after
comparison on exactly the metrics the framework ships.

The synthetic world
-------------------
Every image carries two independent binary visual factors:

* ``gender`` (the protected attribute): the LEFT half of the image is tinted
  red (Female) or blue (Male);
* ``concept`` (the task attribute, orthogonal to gender): the RIGHT half is
  tinted green (``round``) or magenta (``square``).

A tiny word-level vocabulary covers both factors plus 8 "adjective" words.
Bias is planted during contrastive pretraining exactly the way it arises in
web-scraped corpora — by skewed co-occurrence: captions of Female images
carry adjectives from {good, kind, smart, honest} with high probability,
Male images from {evil, rude, dumb, cruel}.  After pretraining, prompts like
"a photo of a good person" rank Female images on top, which is precisely the
failure mode the reference measures with NDKL/MaxSkew on FairFace.

The debias-phase caption-pair corpus (the contrastive term's data, standing
in for flickr30k, README.md:155) is drawn from the SAME distribution —
adjectives at the planted skew — so contrastive fine-tuning alone cannot be
a hidden debiaser; the ablation (``run_ablation_experiment``) proves the
adversarial term is what moves the metrics.

The experiment
--------------
1. measure NDKL (topn = whole set, the reference default) and top-k MaxSkew
   over the 8 adjective prompts, plus zero-shot accuracy of the concept
   probe ("a photo of a round/square person"), all at the UNTRAINED prompt
   init (``debias_token_init="zeros"``, the reference default);
2. run ``run_training`` (the real entry point: FairFace-layout data on disk,
   caption-pair corpus for the contrastive term, adversary, best-NDKL
   selection, ``.pt`` export);
3. re-measure with the selected best prompt array.

Success = NDKL and MaxSkew drop materially while the concept probe does not
crater — the reference's 68.1 → 67.6 contract in miniature.

Run directly:  ``python -m debias_vision_lang_tpu.train.efficacy``
Pinned by:     ``tests/test_efficacy.py`` (slow-marked)
Numbers:       PERF.md "Trainer efficacy" section.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

# ---------------------------------------------------------------------------
# Vocabulary + tokenizer (word-level; EOT must be the max id for the
# EOT-argmax pooling trick, reference model/model.py:265)
# ---------------------------------------------------------------------------

FEMALE_ADJS = ["good", "kind", "smart", "honest"]
MALE_ADJS = ["evil", "rude", "dumb", "cruel"]
ADJECTIVES = FEMALE_ADJS + MALE_ADJS
CONCEPTS = ["round", "square"]
_FILLERS = [f"f{i}" for i in range(8)]
_BASE_WORDS = ["a", "photo", "of", "person", "female", "male"]

VOCAB = 32
CTX = 16
_WORD_IDS = {w: i + 1 for i, w in enumerate(
    _BASE_WORDS + CONCEPTS + ADJECTIVES + _FILLERS)}
SOT, EOT = VOCAB - 2, VOCAB - 1
assert max(_WORD_IDS.values()) < SOT


def word_tokenize(texts: List[str]) -> np.ndarray:
    """[B, CTX] int32; SOT + word ids + EOT, zero-padded (strict vocab)."""
    out = np.zeros((len(texts), CTX), np.int32)
    for i, t in enumerate(texts):
        ids = [_WORD_IDS[w] for w in t.lower().split()]
        if len(ids) > CTX - 2:
            raise ValueError(f"caption too long for CTX={CTX}: {t!r}")
        out[i, 0] = SOT
        out[i, 1 : 1 + len(ids)] = ids
        out[i, 1 + len(ids)] = EOT
    return out


def sensitive_prompts() -> List[str]:
    return [f"a photo of a {adj} person" for adj in ADJECTIVES]


def probe_prompts() -> List[str]:
    return [f"a photo of a {c} person" for c in CONCEPTS]


# ---------------------------------------------------------------------------
# Synthetic world
# ---------------------------------------------------------------------------

PX = 32

_RACES = ["White", "Black", "Indian", "East Asian", "Southeast Asian",
          "Middle Eastern", "Latino_Hispanic"]
_AGES = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59", "60-69",
         "more than 70"]


def render_image(gender: int, concept: int, rng: np.random.Generator,
                 px: int = PX) -> np.ndarray:
    """uint8 [px, px, 3].  gender: 0=Male (blue left half), 1=Female (red
    left half); concept: 0=round (green right half), 1=square (magenta
    right half).  The two factors are deliberately SYMMETRIC in salience
    (each a ±120 channel tint over its own half, linearly decodable from
    per-patch channel means): an asymmetric concept feature (brightness
    position) made two-tower pretraining fall into the gender-only
    contrastive optimum on some float configurations and never align the
    concept words — the probe then sits at chance and the experiment is
    vacuous."""
    img = np.full((px, px, 3), 64, np.float32)
    half = px // 2
    img[:, :half, 0 if gender == 1 else 2] += 120.0
    if concept == 0:
        img[:, half:, 1] += 120.0
    else:
        img[:, half:, 0] += 60.0
        img[:, half:, 2] += 60.0
    img += rng.uniform(-15.0, 15.0, img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def _pretrain_caption(gender: int, concept: int,
                      rng: np.random.Generator) -> str:
    """Biased pretraining caption, in the SAME template family as the
    sensitive/probe prompts (every probe word must be in-distribution for
    the text tower): an adjective 60% of the time drawn from the
    gender-matched pool with probability 0.85 (the planted co-occurrence
    skew), gender/concept words with independent dropout, and a filler
    word for caption diversity."""
    words = ["a", "photo", "of", "a"]
    if rng.random() < 0.6:
        matched = FEMALE_ADJS if gender == 1 else MALE_ADJS
        other = MALE_ADJS if gender == 1 else FEMALE_ADJS
        pool = matched if rng.random() < 0.85 else other
        words.append(pool[rng.integers(len(pool))])
    # factor words drop out independently: captions with ONLY the concept
    # word force concept alignment — with the gender word always present,
    # the contrastive task is solvable by the gender shortcut alone and
    # two-tower training reliably stalls there (observed: concept linear
    # separability 0.50 in image space when gender is always captioned)
    if rng.random() < 0.6:
        words.append("female" if gender == 1 else "male")
    if rng.random() < 0.9:
        words.append(CONCEPTS[concept])
    words += ["person", _FILLERS[rng.integers(len(_FILLERS))]]
    return " ".join(words)


def _pairs_caption(gender: int, concept: int,
                   rng: np.random.Generator) -> str:
    """Debias-phase contrastive caption: drawn from the SAME distribution
    as the pretraining corpus — adjectives at the planted 85/15 skew,
    fresh samples.  Real flickr30k (the reference's debias-phase corpus,
    README.md:155) is more web text with the same natural co-occurrence
    biases as CLIP's pretraining data, not a sanitized corpus.  An earlier
    adjective-free variant left the adjective embeddings unconstrained by
    the contrastive term, and on one seed plain contrastive fine-tuning
    debiased as much as the adversary — with the natural skew present the
    contrastive term actively maintains the bias, so any drop is
    attributable to the adversarial objective (the causal claim of the
    ablation, VERDICT r4 item 1)."""
    return _pretrain_caption(gender, concept, rng)


def build_world(root: str, n_train: int = 2048, n_val: int = 512,
                px: int = PX, seed: int = 0) -> Dict:
    """Write the FairFace-layout dataset + caption-pair corpus under root.

    Returns dict with paths and the in-memory pretraining arrays (images,
    captions) so pretraining needs no decode pass.  Layout (matching
    data/datasets.py::FairFace and data/pairs.py::ImageCaptionPairs):

        root/fairface/imgs/train_val/syn/*.jpg
        root/fairface/labels/{train,val}/{train,val}_labels.csv
        root/pairs/captions.csv + root/pairs/images -> symlink to syn/
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    ff = os.path.join(root, "fairface")
    img_dir = os.path.join(ff, "imgs", "train_val", "syn")
    os.makedirs(img_dir, exist_ok=True)

    def make_split(mode: str, n: int):
        import pandas as pd

        rows, images, pre_captions = [], [], []
        for i in range(n):
            gender, concept = int(rng.integers(2)), int(rng.integers(2))
            img = render_image(gender, concept, rng, px)
            fname = f"syn/{mode}_{i:05d}.jpg"
            Image.fromarray(img).save(
                os.path.join(ff, "imgs", "train_val", fname), quality=95)
            rows.append({
                "file": fname,
                "age": _AGES[int(rng.integers(len(_AGES)))],
                "gender": "Female" if gender == 1 else "Male",
                "race": _RACES[int(rng.integers(len(_RACES)))],
                "concept": concept,
            })
            images.append(img)
            pre_captions.append(_pretrain_caption(gender, concept, rng))
        lbl_dir = os.path.join(ff, "labels", mode)
        os.makedirs(lbl_dir, exist_ok=True)
        df = pd.DataFrame(rows)
        df.to_csv(os.path.join(lbl_dir, f"{mode}_labels.csv"), index=False)
        return df, np.stack(images), pre_captions

    train_df, train_images, train_captions = make_split("train", n_train)
    make_split("val", n_val)

    pairs = os.path.join(root, "pairs")
    os.makedirs(pairs, exist_ok=True)
    link = os.path.join(pairs, "images")
    if not os.path.exists(link):
        try:
            os.symlink(os.path.join(ff, "imgs", "train_val"), link)
        except OSError:  # no-symlink filesystems: fall back to copying
            import shutil

            shutil.copytree(os.path.join(ff, "imgs", "train_val"), link)
    import pandas as pd

    gid = (train_df["gender"] == "Female").astype(int)
    pairs_rng = np.random.default_rng(seed + 104729)  # own stream: adding
    # the pairs corpus must not perturb the world's image/label draws
    pd.DataFrame({
        "file": train_df["file"],
        "caption": [_pairs_caption(int(g), int(c), pairs_rng)
                    for g, c in zip(gid, train_df["concept"])],
    }).to_csv(os.path.join(pairs, "captions.csv"), index=False)

    return {
        "fairface": ff,
        "pairs": pairs,
        "train_images": train_images,
        "train_captions": train_captions,
    }


# ---------------------------------------------------------------------------
# Tiny CLIP + contrastive pretraining (plants the bias)
# ---------------------------------------------------------------------------


def tiny_clip_cfg(px: int = PX):
    from ..core.config import CLIPConfig, TextConfig, VisionConfig

    return CLIPConfig(
        name="tiny-efficacy",
        vision=VisionConfig(kind="vit", image_size=px, patch_size=8,
                            width=64, layers=2, heads=4, embed_dim=32),
        text=TextConfig(vocab_size=VOCAB, context_length=CTX, width=64,
                        layers=2, heads=4, embed_dim=32),
    )


def pretrain_tiny_clip(images_u8: np.ndarray, captions: List[str],
                       steps: int = 400, batch_size: int = 64,
                       lr: float = 2e-3, seed: int = 0, px: int = PX,
                       progress: bool = False):
    """Contrastive pretraining of the full tiny tower on the biased corpus.

    Returns (params, cfg).  This is the stand-in for OpenAI's web-scale
    pretraining: it aligns the text words with the visual factors INCLUDING
    the skewed adjective co-occurrence — afterwards the adjective prompts
    are measurably gender-biased, which is the condition the adversarial
    trainer exists to fix."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import clip as clip_model
    from ..vision.preprocess import preprocess_batch
    from .adversarial import clip_contrastive_loss

    cfg = tiny_clip_cfg(px)
    params = clip_model.init_clip_params(jax.random.key(seed), cfg)
    tokens = word_tokenize(captions)
    stats = {"mean": cfg.vision.image_mean, "std": cfg.vision.image_std}
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, imgs_u8, toks):
        imgs = preprocess_batch(imgs_u8, px, **stats)

        def loss_fn(p):
            img = clip_model.encode_image(p, imgs, cfg).astype(jnp.float32)
            txt = clip_model.encode_text(p, toks, cfg).astype(jnp.float32)
            return clip_contrastive_loss(img, txt, p["logit_scale"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(images_u8)
    order = rng.permutation(n)
    cursor = 0
    for it in range(steps):
        if cursor + batch_size > n:
            order, cursor = rng.permutation(n), 0
        sel = order[cursor : cursor + batch_size]
        cursor += batch_size
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images_u8[sel]),
            jnp.asarray(tokens[sel]))
        if progress and (it % 50 == 0 or it == steps - 1):
            print(f"pretrain step {it}: contrastive loss {float(loss):.4f}")
    return params, cfg


# ---------------------------------------------------------------------------
# Measurement (the framework's own metrics, before vs after)
# ---------------------------------------------------------------------------


def measure_model(model, val_ds, topk: int = 50,
                  data_path: Optional[str] = None) -> Dict[str, float]:
    """NDKL (topn=1.0, the reference default) + top-k MaxSkew over the
    adjective prompts, and zero-shot concept-probe accuracy — all with the
    model's CURRENT debias tokens injected (untrained init or trained).

    With ``data_path`` the bias numbers come out of the SHIPPED entry point
    — ``eval.measure.measure_bias`` with live opts (custom prompt battery,
    per-metric topn, embedding cache: the second call reuses the first
    call's image embeddings through the resolved-rung cache key) — so the
    efficacy record measures exactly what a user of the framework would
    run (VERDICT r4 item 5).  Without it (no on-disk world, e.g. unit
    fixtures), falls back to the same engines called directly."""
    import jax.numpy as jnp

    from ..eval.measure import get_prompt_embeddings

    n_px = model.clip_cfg.vision.image_size
    if data_path is not None:
        import tempfile

        from ..eval.measure import measure_bias
        from ..vision.preprocess import Preprocess

        preproc = Preprocess(n_px=n_px)
        with tempfile.TemporaryDirectory(prefix="efficacy_embs_") as td:
            cache = os.path.join(td, "val_embeddings.npz")
            common = {"prompts": sensitive_prompts(), "data_path": data_path,
                      "cache_embeddings": cache}
            ndkl = measure_bias(
                model, preproc, word_tokenize, "gender",
                opts={**common, "evaluations": ("ndkl",), "topn": 1.0,
                      "progress": False})["ndkl"]
            maxskew = measure_bias(  # cache HIT: no second image pass
                model, preproc, word_tokenize, "gender",
                opts={**common, "evaluations": ("maxskew",), "topn": topk,
                      "progress": False})["maxskew"]
            img_embs = jnp.asarray(np.load(cache)["embeddings"])
        # probe labels below come from the CALLER's val_ds; the embeddings
        # from measure_bias's internally-constructed dataset.  Both are
        # FairFace(mode="val", iat_type="gender") at identical defaults →
        # identical row order; guard the alignment invariant loudly.
        if len(img_embs) != len(val_ds.labels):
            raise AssertionError(
                f"measure_bias embedded {len(img_embs)} rows but val_ds has "
                f"{len(val_ds.labels)} — dataset construction drifted")
    else:
        from ..data.loader import HostLoader
        from ..eval.measure import eval_ranking, get_labels_img_embeddings

        loader = HostLoader(val_ds, batch_size=256, native_n_px=n_px)
        labels, img_embs = get_labels_img_embeddings(loader, model, n_px=n_px)
        prompt_embs = get_prompt_embeddings(model, word_tokenize,
                                            sensitive_prompts())
        ndkl = eval_ranking(labels, img_embs, prompt_embs, "ndkl", topn=1.0)
        maxskew = eval_ranking(labels, img_embs, prompt_embs, "maxskew",
                               topn=topk)

    probe = get_prompt_embeddings(model, word_tokenize, probe_prompts())
    img_n = img_embs / jnp.linalg.norm(img_embs, axis=-1, keepdims=True)
    pred = np.asarray(jnp.argmax(img_n @ probe.T, axis=1))
    concept = val_ds.labels["concept"].to_numpy()
    return {
        "ndkl_eq_opp": float(ndkl["eq_opp"]),
        "ndkl_dem_par": float(ndkl["dem_par"]),
        f"maxskew@{topk}_eq_opp": float(maxskew["eq_opp"]),
        f"maxskew@{topk}_dem_par": float(maxskew["dem_par"]),
        "probe_acc": float(np.mean(pred == concept)),
    }


# ---------------------------------------------------------------------------
# The experiment
# ---------------------------------------------------------------------------


def prepare_world(root: str, n_train: int = 2048, n_val: int = 512,
                  pretrain_steps: int = 2500, batch_size: int = 64,
                  seed: int = 0, progress: bool = False):
    """Build the biased world + pretrain the tiny CLIP on it (the expensive
    shared prefix of every experiment arm).  Returns (world, params, cfg,
    val_ds).  The returned params are the BIASED pretrained tower — arms
    must not mutate them (jax arrays are immutable; arms rebind copies)."""
    from ..data.datasets import FairFace

    world = build_world(root, n_train=n_train, n_val=n_val, seed=seed)
    params, cfg = pretrain_tiny_clip(
        world["train_images"], world["train_captions"],
        steps=pretrain_steps, batch_size=batch_size, seed=seed,
        progress=progress)
    val_ds = FairFace(mode="val", iat_type="gender",
                      data_path=world["fairface"])
    return world, params, cfg, val_ds


def _fresh_model(params, cfg, seed: int):
    """A fresh DebiasCLIP at the reference-default prompt init ("zeros" =
    embeddings of token id 0).  A new object per arm: AdversarialTrainer
    rebinds model.debias_tokens/clip_params during training."""
    import jax

    from ..core.config import DebiasConfig
    from ..models.debias import DebiasCLIP, init_debias_tokens

    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=cfg.text.width,
                        max_tokens=CTX, debias_pos="prepend",
                        debias_token_init="zeros")
    deb = init_debias_tokens(jax.random.key(seed + 1), params, dcfg,
                             tokenizer=None)
    return DebiasCLIP(clip_params=params, debias_tokens=deb, clip_cfg=cfg,
                      debias_cfg=dcfg)


def run_arm(
    world: Dict,
    params,
    cfg,
    val_ds,
    ckpt_dir: str,
    epochs: int = 3,
    batch_size: int = 64,
    eval_every: int = 8,
    topk: int = 50,
    seed: int = 0,
    prompt_lr: Optional[float] = None,
    adversarial_weight: Optional[float] = None,
    progress: bool = False,
    before: Optional[Dict] = None,
) -> Dict:
    """One experiment arm: measure → run_training → measure with the
    best-NDKL prompt array.  ``adversarial_weight=0`` is the ablation
    control (contrastive fine-tuning only; the adversary still trains but
    its gradient never reaches the prompt array, core/config.py:189 →
    adversarial.py:286).

    ``before`` — a precomputed before-measurement: arms of one ablation
    seed start from the identical model state, so the measurement is
    byte-identical across arms and the caller computes it once
    (run_ablation_experiment); None measures here."""
    import jax.numpy as jnp

    from ..core.config import TrainConfig
    from .loop import run_training

    model = _fresh_model(params, cfg, seed)
    if before is None:
        before = measure_model(model, val_ds, topk=topk,
                               data_path=world["fairface"])
    if progress:
        print("before:", json.dumps(before, indent=2))

    tcfg = TrainConfig(
        batch_size=batch_size, num_epochs=epochs, eval_every_steps=eval_every,
        seed=seed,
        prompt_lr=prompt_lr if prompt_lr is not None else 2e-3,
        adversarial_weight=(adversarial_weight
                            if adversarial_weight is not None else 1.0),
        checkpoint_dir=ckpt_dir,
    )
    summary = run_training(
        model=model,
        tokenizer=word_tokenize,
        attribute="gender",
        data_path=world["fairface"],
        pairs_path=world["pairs"],
        sensitive_prompts=sensitive_prompts(),
        eval_n_samples=None,
        train_cfg=tcfg,
        checkpoint_dir=tcfg.checkpoint_dir,
        use_pallas=False,
        progress=progress,
        seed=seed,
    )

    # the exported .pt IS the best-NDKL prompt array (reference checkpoint
    # format: a bare [P, width] tensor, model/clip.py:75-81)
    import torch

    best = torch.load(summary["export"], map_location="cpu",
                      weights_only=True).numpy()
    model.debias_tokens = jnp.asarray(best)
    after = measure_model(model, val_ds, topk=topk,
                          data_path=world["fairface"])
    if progress:
        print("after:", json.dumps(after, indent=2))

    curve = []
    log_path = os.path.join(summary["checkpoint_dir"], "logs",
                            "metrics.jsonl")
    if os.path.exists(log_path):
        for line in open(log_path):
            rec = json.loads(line)
            if "ndkl_eq_opp" in rec:
                curve.append({"step": rec.get("step"),
                              "ndkl_eq_opp": rec["ndkl_eq_opp"]})

    def _rel_drop(key):
        b = before[key]
        return float("nan") if b == 0 else (b - after[key]) / b

    return {
        "before": before,
        "after": after,
        "reduction": {k: _rel_drop(k) for k in before if k != "probe_acc"},
        "train_summary": summary,
        "curve": curve,
    }


def run_efficacy_experiment(
    root: str,
    n_train: int = 2048,
    n_val: int = 512,
    pretrain_steps: int = 2500,
    epochs: int = 3,
    batch_size: int = 64,
    eval_every: int = 8,
    topk: int = 50,
    seed: int = 0,
    prompt_lr: Optional[float] = None,
    adversarial_weight: Optional[float] = None,
    progress: bool = False,
) -> Dict:
    """Build world → pretrain (bias planted) → measure → run_training →
    measure with the best-NDKL prompt array.  Returns the full record."""
    world, params, cfg, val_ds = prepare_world(
        root, n_train=n_train, n_val=n_val, pretrain_steps=pretrain_steps,
        batch_size=batch_size, seed=seed, progress=progress)
    return run_arm(world, params, cfg, val_ds,
                   ckpt_dir=os.path.join(root, "ckpt"), epochs=epochs,
                   batch_size=batch_size, eval_every=eval_every, topk=topk,
                   seed=seed, prompt_lr=prompt_lr,
                   adversarial_weight=adversarial_weight, progress=progress)


def run_ablation_experiment(
    root: str,
    seeds=(0, 1, 2),
    n_train: int = 2048,
    n_val: int = 512,
    pretrain_steps: int = 2500,
    epochs: int = 3,
    batch_size: int = 64,
    eval_every: int = 8,
    topk: int = 50,
    progress: bool = False,
) -> Dict:
    """The causal experiment (VERDICT r4 item 1): per seed, ONE world + ONE
    biased pretrain, then TWO arms from identical initial conditions —

    * ``adversarial`` — the full objective (adversarial_weight=1), and
    * ``control`` — adversarial_weight=0: identical data, schedule,
      contrastive term, optimizer, and best-NDKL selection; the ONLY
      difference is that the adversary's gradient never reaches the prompts.

    If the adversarial arm's NDKL reduction materially beats the control's
    on every seed, the adversarial term — not clean-caption contrastive
    fine-tuning — is the cause of the bias drop, which is the reference's
    specific claim (README.md:148-157)."""
    results: Dict = {"seeds": {}, "config": {
        "n_train": n_train, "n_val": n_val, "pretrain_steps": pretrain_steps,
        "epochs": epochs, "batch_size": batch_size, "eval_every": eval_every,
        "topk": topk,
    }}
    for seed in seeds:
        seed_root = os.path.join(root, f"seed{seed}")
        world, params, cfg, val_ds = prepare_world(
            seed_root, n_train=n_train, n_val=n_val,
            pretrain_steps=pretrain_steps, batch_size=batch_size, seed=seed,
            progress=progress)
        # ONE before-measurement per seed: both arms start from the
        # identical fresh model over the identical val split, so measuring
        # per-arm would recompute byte-identical numbers (measure_model is
        # deterministic) at a full val-embed's cost
        before = measure_model(_fresh_model(params, cfg, seed), val_ds,
                               topk=topk, data_path=world["fairface"])
        arms = {}
        for name, w in (("adversarial", 1.0), ("control", 0.0)):
            if progress:
                print(f"=== seed {seed} arm {name} (adv_weight={w}) ===")
            arms[name] = run_arm(
                world, params, cfg, val_ds,
                ckpt_dir=os.path.join(seed_root, f"ckpt_{name}"),
                epochs=epochs, batch_size=batch_size, eval_every=eval_every,
                topk=topk, seed=seed, adversarial_weight=w,
                progress=progress, before=before)
        results["seeds"][seed] = arms
        if progress:
            a, c = arms["adversarial"], arms["control"]
            print(f"seed {seed}: adversarial NDKL "
                  f"{a['before']['ndkl_eq_opp']:.3f} → "
                  f"{a['after']['ndkl_eq_opp']:.3f} "
                  f"(drop {a['reduction']['ndkl_eq_opp']:.1%}) | control "
                  f"{c['before']['ndkl_eq_opp']:.3f} → "
                  f"{c['after']['ndkl_eq_opp']:.3f} "
                  f"(drop {c['reduction']['ndkl_eq_opp']:.1%})")
    return results


def main(argv=None):
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", default=None,
                    help="working dir (default: a fresh temp dir)")
    ap.add_argument("--n-train", type=int, default=2048)
    ap.add_argument("--n-val", type=int, default=512)
    ap.add_argument("--pretrain-steps", type=int, default=2500)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--eval-every", type=int, default=8)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ablation", action="store_true",
                    help="run the adversarial-vs-control causal experiment "
                         "over --seeds instead of a single arm")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--adversarial-weight", type=float, default=None)
    ap.add_argument("--json-out", default=None,
                    help="also write the full record to this path")
    args = ap.parse_args(argv)
    root = args.root or tempfile.mkdtemp(prefix="efficacy_")
    if args.ablation:
        out = run_ablation_experiment(
            root, seeds=tuple(args.seeds), n_train=args.n_train,
            n_val=args.n_val, pretrain_steps=args.pretrain_steps,
            epochs=args.epochs, batch_size=args.batch_size,
            eval_every=args.eval_every, topk=args.topk, progress=True)
        printable = {
            str(s): {arm: {k: rec[k]
                           for k in ("before", "after", "reduction", "curve")}
                     for arm, rec in arms.items()}
            for s, arms in out["seeds"].items()}
    else:
        out = run_efficacy_experiment(
            root, n_train=args.n_train, n_val=args.n_val,
            pretrain_steps=args.pretrain_steps, epochs=args.epochs,
            batch_size=args.batch_size, eval_every=args.eval_every,
            topk=args.topk, seed=args.seed,
            adversarial_weight=args.adversarial_weight, progress=True)
        printable = {k: out[k]
                     for k in ("before", "after", "reduction", "curve")}
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(printable, f, indent=2)
    print(json.dumps(printable, indent=2))


if __name__ == "__main__":
    main()
