import numpy as np
import pytest

from debias_vision_lang_tpu.text.bpe import (
    BPE,
    build_vocab,
    bytes_to_unicode,
)
from debias_vision_lang_tpu.text.cleaning import clean, whitespace_clean
from debias_vision_lang_tpu.text.tokenizer import ClipTokenizer


class TestBytesToUnicode:
    def test_bijective_256(self):
        m = bytes_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256

    def test_printable_ascii_identity(self):
        m = bytes_to_unicode()
        for b in range(ord("!"), ord("~") + 1):
            assert m[b] == chr(b)

    def test_space_remapped(self):
        m = bytes_to_unicode()
        assert m[ord(" ")] != " "


class TestVocabConstruction:
    def test_eot_is_max_id(self, toy_tokenizer):
        # the EOT-argmax pooling trick (reference model/model.py:265)
        # requires EOT to be the largest id for ANY vocab
        assert toy_tokenizer.eot_token == toy_tokenizer.vocab_size - 1
        assert toy_tokenizer.sot_token == toy_tokenizer.vocab_size - 2

    def test_real_vocab_size_formula(self):
        # 2*256 base + merges + 2 specials; CLIP's real file → 49408
        merges = [("a", "b"), ("c", "d</w>")]
        vocab = build_vocab(merges)
        assert len(vocab) == 512 + 2 + 2


class TestBPEAlgorithm:
    def test_merge_priority(self):
        # lower-rank merges apply first
        bpe = BPE([("a", "b"), ("ab", "c</w>")])
        assert bpe("abc") == "abc</w>"

    def test_no_merge_fallthrough(self):
        bpe = BPE([("x", "y")])
        assert bpe("ab") == "a b</w>"

    def test_end_of_word_marker(self):
        bpe = BPE([])
        assert bpe("a") == "a</w>"

    def test_word_final_merge_needs_eow_variant(self):
        # ("a","b") cannot fire on word-final "b" (which is "b</w>")
        bpe = BPE([("a", "b")])
        assert bpe("ab") == "a b</w>"

    def test_cache_consistency(self):
        bpe = BPE([("a", "b</w>")])
        assert bpe("ab") == bpe("ab") == "ab</w>"


class TestCleaning:
    def test_whitespace_collapse(self):
        assert whitespace_clean("a   b\t\nc ") == "a b c"

    def test_html_double_unescape(self):
        # &amp;amp; → &amp; → &  (double unescape, CLIP behavior)
        assert clean("&amp;amp;") == "&"

    def test_strip(self):
        assert clean("  hello  ") == "hello"


class TestTokenize:
    def test_shape_and_dtype(self, toy_tokenizer):
        out = toy_tokenizer(["the cat", "a dog"])
        assert out.shape == (2, 16)
        assert out.dtype == np.int32

    def test_sot_eot_framing(self, toy_tokenizer):
        out = toy_tokenizer("the cat")[0]
        assert out[0] == toy_tokenizer.sot_token
        eot_pos = int(np.argmax(out))
        assert out[eot_pos] == toy_tokenizer.eot_token
        # zero padding after EOT
        assert (out[eot_pos + 1 :] == 0).all()

    def test_eot_argmax_trick(self, toy_tokenizer):
        # argmax over ids must locate EOT (downstream pooling relies on it)
        out = toy_tokenizer(["the cat", "a dog and a cat"])
        for row in out:
            assert row[np.argmax(row)] == toy_tokenizer.eot_token

    def test_lowercasing(self, toy_tokenizer):
        assert (toy_tokenizer("THE CAT") == toy_tokenizer("the cat")).all()

    def test_too_long_raises(self, toy_tokenizer):
        long_text = "z " * 50
        with pytest.raises(RuntimeError):
            toy_tokenizer(long_text)

    def test_truncate(self, toy_tokenizer):
        out = toy_tokenizer("z " * 50, truncate=True)[0]
        assert out[0] == toy_tokenizer.sot_token
        assert out[-1] == toy_tokenizer.eot_token
        assert (out != 0).all()

    def test_single_string_batches(self, toy_tokenizer):
        assert toy_tokenizer("the cat").shape == (1, 16)

    def test_decode_roundtrip(self, toy_tokenizer):
        ids = toy_tokenizer.encode("the cat is a dog")
        assert toy_tokenizer.decode(ids).strip() == "the cat is a dog"


@pytest.mark.skipif(
    not __import__("os").path.exists(
        __import__("debias_vision_lang_tpu.core.paths", fromlist=["BPE_VOCAB_PATH"]).BPE_VOCAB_PATH
    ),
    reason="real CLIP BPE vocab not present (requires network fetch)",
)
class TestRealVocabGolden:
    """Golden ids recorded from OpenAI clip.tokenize — run when the real
    merges file is available."""

    def test_golden_ids(self):
        from debias_vision_lang_tpu.text.tokenizer import load_tokenizer

        tok = load_tokenizer()
        assert tok.vocab_size == 49408
        assert tok.sot_token == 49406 and tok.eot_token == 49407
        out = tok(["a photo of a cat"])[0]
        assert out[0] == 49406
        assert out[int(np.argmax(out))] == 49407


class TestTokenizerEdgeCases:
    def test_unicode_bytes_roundtrip(self, toy_tokenizer):
        # non-ASCII text encodes through the byte map without loss
        ids = toy_tokenizer.encode("café ☕")
        assert toy_tokenizer.decode(ids).strip() == "café ☕"

    def test_contractions_split(self, toy_tokenizer):
        # pattern isolates 's as its own chunk
        a = toy_tokenizer.encode("cat's")
        b = toy_tokenizer.encode("cat 's")
        c = toy_tokenizer.encode("cat")
        # "cat's" = tokens("cat") + tokens("'s"): contraction split off
        assert a[: len(c)] == c

    def test_punctuation_runs_grouped(self, toy_tokenizer):
        # "!!" is one pre-token chunk (punctuation run), not two
        ids_single = toy_tokenizer.encode("!")
        ids_double = toy_tokenizer.encode("!!")
        # without merges for "!!" it stays two byte symbols inside one chunk
        assert len(ids_double) >= len(ids_single)

    def test_numbers_tokenized_per_digit(self, toy_tokenizer):
        ids = toy_tokenizer.encode("12")
        # \p{N} matches single digits → two separate chunks
        assert len(ids) == 2

    def test_empty_string(self, toy_tokenizer):
        out = toy_tokenizer([""])
        assert out[0][0] == toy_tokenizer.sot_token
        assert out[0][1] == toy_tokenizer.eot_token

    def test_whitespace_only(self, toy_tokenizer):
        out = toy_tokenizer(["   \t\n "])
        assert out[0][1] == toy_tokenizer.eot_token

    def test_html_entity_cleaning(self, toy_tokenizer):
        assert (toy_tokenizer("the &amp;amp; cat") == toy_tokenizer("the & cat")).all()


class TestGoldenFixture:
    """Pinned token ids (tests/fixtures/tokenizer_golden.json): the full
    319-prompt battery + corner cases on a committed synthetic merge table.
    Any algorithmic change to cleaning / pre-tokenization / BPE / padding
    shows up as a diff here.  Regenerate ONLY after verifying against
    ``clip.tokenize`` with the real merges file (network required)."""

    @pytest.fixture(scope="class")
    def fixture_data(self):
        import json
        import os

        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "tokenizer_golden.json")
        with open(path) as f:
            return json.load(f)

    def test_all_cases_match(self, fixture_data):
        merges = [tuple(m) for m in fixture_data["merges"]]
        tok = ClipTokenizer(merges, fixture_data["context_length"])
        bad = []
        for case in fixture_data["cases"]:
            ids = tok([case["text"]], truncate=True)[0].tolist()
            if ids != case["ids"]:
                bad.append(case["text"])
        assert not bad, f"{len(bad)} tokenizations changed, first: {bad[0]!r}"


class TestHFCrossImplementationParity:
    """Independent-oracle check: our tokenizer must agree ID-for-ID with
    HuggingFace's CLIPTokenizer (the canonical port of openai/CLIP's BPE)
    on a shared synthetic vocab.  Known, intended divergence: HF without
    ftfy skips OpenAI's double html.unescape — inputs with entities are
    excluded here (ours follows OpenAI; pinned in TestGoldenFixture)."""

    def test_ids_match_hf(self):
        import json
        import os
        import tempfile

        pytest.importorskip("transformers")
        from transformers import CLIPTokenizer

        from debias_vision_lang_tpu.text.bpe import build_vocab

        merges = [("t", "h"), ("th", "e</w>"), ("p", "e"), ("pe", "r"),
                  ("per", "s"), ("pers", "o"), ("perso", "n</w>"),
                  ("g", "o"), ("go", "o"), ("goo", "d</w>"), ("i", "s</w>"),
                  ("w", "o"), ("wo", "m"), ("a", "n</w>"), ("m", "an</w>"),
                  ("wom", "an</w>"), ("i", "n"), ("in", "g</w>")]
        vocab = build_vocab(merges)
        texts = ["a photo of a good person", "the woman is working",
                 "THE    Person  ", "don't stop, it's fine",
                 "digits 123 and 45", "punct!!! ... ???", "",
                 "café ☕", "hyphen-ated", "we'll i'm i'd",
                 "<|startoftext|> x <|endoftext|>", "x" * 300]
        with tempfile.TemporaryDirectory() as d:
            vf, mf = os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
            with open(vf, "w") as f:
                json.dump(vocab, f)
            with open(mf, "w") as f:
                f.write("#version: 0.2\n")
                for a, b in merges:
                    f.write(f"{a} {b}\n")
            hf = CLIPTokenizer(vf, mf, model_max_length=77)
            ours = ClipTokenizer(merges, context_length=77)
            for t in texts:
                h = hf(t, truncation=True, max_length=77)["input_ids"]
                o = ours([t], truncate=True)[0].tolist()
                # strip zero PADDING from the right only: id 0 ('!') is a
                # real token but can never be FINAL (the last symbol of any
                # chunk carries '</w>')
                while o and o[-1] == 0:
                    o.pop()
                assert o == h, f"{t!r}: ours {o} != hf {h}"


class TestMergesFileFireDrill:
    """Drill the REAL-file loading path (text/bpe.py::read_merges +
    tokenizer.load_tokenizer) on fabricated files in the exact format of
    ``bpe_simple_vocab_16e6.txt.gz`` (version-header first line, space-
    separated merge pairs, trailing newline) — this code has otherwise
    never run before the network-gated asset appears (VERDICT 2.21 risk).
    OpenAI's loader slices ``lines[1 : 49152-256-2+1]``; ours must match.
    """

    MERGES = [("t", "h"), ("th", "e</w>"), ("c", "a"), ("ca", "t</w>")]

    def _write(self, path, n_lines=None, gz=False, trailing="\n"):
        import gzip

        lines = ["#version: 0.2 - fabricated drill file"]
        lines += [f"{a} {b}" for a, b in self.MERGES]
        if n_lines is not None:  # pad with unique junk merges past limit
            lines += [f"x{i} y{i}" for i in range(n_lines - len(self.MERGES))]
        data = "\n".join(lines) + trailing
        if gz:
            with gzip.open(path, "wt", encoding="utf-8") as f:
                f.write(data)
        else:
            with open(path, "w", encoding="utf-8") as f:
                f.write(data)

    def test_gz_roundtrip_and_header_skip(self, tmp_path):
        from debias_vision_lang_tpu.text.bpe import read_merges

        p = str(tmp_path / "vocab.txt.gz")
        self._write(p, gz=True)
        merges = read_merges(p)
        assert merges == self.MERGES  # header line skipped, pairs parsed

    def test_plain_text_same_result(self, tmp_path):
        from debias_vision_lang_tpu.text.bpe import read_merges

        g, t = str(tmp_path / "v.txt.gz"), str(tmp_path / "v.txt")
        self._write(g, gz=True)
        self._write(t, gz=False)
        assert read_merges(g) == read_merges(t)

    def test_limit_slice_matches_openai(self, tmp_path):
        """Files longer than the merge budget are cut at lines[1:limit+1] —
        the real file has extra lines past 48,894 that clip.py discards."""
        from debias_vision_lang_tpu.text.bpe import read_merges

        p = str(tmp_path / "long.txt.gz")
        self._write(p, n_lines=50, gz=True)
        merges = read_merges(p, limit=10)
        assert len(merges) == 10
        assert merges[: len(self.MERGES)] == self.MERGES
        # real-file invariant: the default budget yields the 49,408 vocab
        from debias_vision_lang_tpu.text.bpe import build_vocab

        assert len(build_vocab([("a", f"b{i}") for i in range(48894)])) == 49408

    def test_load_tokenizer_end_to_end(self, tmp_path):
        """load_tokenizer on a real-format gz → working ClipTokenizer with
        the EOT-max-id invariant and functioning encode/decode."""
        from debias_vision_lang_tpu.text.tokenizer import load_tokenizer

        p = str(tmp_path / "drill.txt.gz")
        self._write(p, gz=True)
        tok = load_tokenizer(p, context_length=16)
        assert tok.vocab_size == 512 + len(self.MERGES) + 2
        assert tok.eot_token == tok.vocab_size - 1
        ids = tok(["the cat"])[0]
        assert ids[0] == tok.sot_token
        assert ids[int(np.argmax(ids))] == tok.eot_token
        assert tok.decode(tok.encode("the cat")).strip() == "the cat"

    def test_no_trailing_newline(self, tmp_path):
        """The reference prompt CSV famously lacks a trailing newline;
        guard the merges parser against the same quirk."""
        from debias_vision_lang_tpu.text.bpe import read_merges

        p = str(tmp_path / "nonl.txt")
        self._write(p, gz=False, trailing="")
        assert read_merges(p) == self.MERGES

    def test_random_fuzz_matches_hf(self):
        """Property fuzz: 300 random strings (ASCII mixes, unicode planes,
        whitespace runs, contractions, punctuation storms) must tokenize
        ID-for-ID like HF's CLIPTokenizer on the shared synthetic vocab —
        broadens the curated-case parity toward the real-vocab gated test.
        Excluded as DOCUMENTED no-ftfy HF divergences (ours follows
        OpenAI): HTML-entity inputs (double html.unescape) and CJK
        ideographs (transformers' fallback BasicTokenizer inserts spaces
        around them; openai/CLIP does not)."""
        import json
        import os
        import random
        import tempfile

        pytest.importorskip("transformers")
        from transformers import CLIPTokenizer

        from debias_vision_lang_tpu.text.bpe import build_vocab

        merges = [("t", "h"), ("th", "e</w>"), ("p", "e"), ("pe", "r"),
                  ("per", "s"), ("g", "o"), ("go", "o"), ("i", "s</w>"),
                  ("w", "o"), ("a", "n</w>"), ("i", "n"), ("in", "g</w>")]
        vocab = build_vocab(merges)
        rnd = random.Random(42)
        alphabets = [
            "abcdefghijklmnopqrstuvwxyz",
            "abc THE 'sper’ \t\n  ",
            "0123456789!?.,;:-_()[]{}@#$%^*",
            "αβγδεζ зыдвгж اللغة",
            "emoji 😀🎉🧪 mixé café übermäßig",
            "'s 't 're 've 'm 'll 'd",
        ]
        texts = []
        for _ in range(300):
            alpha = rnd.choice(alphabets)
            n = rnd.randint(0, 40)
            texts.append("".join(rnd.choice(alpha) for _ in range(n)))
        with tempfile.TemporaryDirectory() as d:
            vf, mf = os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
            with open(vf, "w") as f:
                json.dump(vocab, f)
            with open(mf, "w") as f:
                f.write("#version: 0.2\n")
                for a, b in merges:
                    f.write(f"{a} {b}\n")
            hf = CLIPTokenizer(vf, mf, model_max_length=77)
            ours = ClipTokenizer(merges, context_length=77)
            mismatches = []
            for t in texts:
                h = hf(t, truncation=True, max_length=77)["input_ids"]
                o = ours([t], truncate=True)[0].tolist()
                while o and o[-1] == 0:
                    o.pop()
                if o != h:
                    mismatches.append((t, o, h))
            assert not mismatches, mismatches[:3]
