"""HFTokenizer coverage with a constructed HuggingFace fixture.

The production tokenizer entry is ``LlamaTokenizer.from_pretrained`` on the
released SEED-X dir (reference: configs/tokenizer/
clm_llama_tokenizer_224loc_anyres.yaml, used by every eval script).  The
released files are not in this environment, so the fixture is a tiny fast
tokenizer built in-repo (transformers is installed, sentencepiece is not)
whose base vocab covers the full 32000-id range and whose 330 multimodal
specials are registered in a SCRAMBLED order — the overlay in
seedx_tpu/text/tokenizer.py must pin model-side ids to the MultimodalVocab
layout regardless of HF registration order.
"""

import json

import pytest

from seedx_tpu.text.tokenizer import (ByteFallbackTokenizer, HFTokenizer,
                                      load_tokenizer)
from seedx_tpu.text.vocab import DEFAULT_VOCAB


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    path = tmp_path_factory.mktemp("hf_tok")
    # base vocab covering ids 0..31999 so ANY base-range model output
    # decodes (the debug LLM samples over the whole 32330 space)
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2,
             "hello": 3, "world": 4, "a": 5, "red": 6, "car": 7}
    vocab.update({f"w{i}": i for i in range(8, 32000)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<unk>")
    # register the multimodal specials in reverse order — HF then assigns
    # them ids 32000.. in an order that does NOT match the model layout
    fast.add_tokens(list(reversed(DEFAULT_VOCAB.special_token_strings())),
                    special_tokens=True)
    fast.save_pretrained(str(path))
    return str(path)


def test_overlay_pins_special_ids(hf_dir):
    tok = HFTokenizer(hf_dir)
    v = DEFAULT_VOCAB
    # HF registered <img_00000> LAST (reversed order) but the overlay must
    # still emit the layout id 32000
    assert tok.encode("<img_00000>") == [v.img_token_id(0)] == [32000]
    assert tok.encode("<img_00063>") == [v.img_token_id(63)]
    assert tok.encode("<loc-0>") == [v.loc_token_id(0)] == [32100]
    assert tok.encode("<loc-223>") == [v.loc_token_id(223)]
    assert tok.encode("<img>") == [v.boi] == [32324]
    assert tok.encode("</img>") == [v.eoi]
    assert tok.encode("<patch>") == [v.bop]
    assert tok.encode("</patch>") == [v.eop]
    assert tok.encode("<box_start>") == [v.box_start]
    assert tok.encode("<box_end>") == [v.box_end] == [32329]
    # and the raw HF ids genuinely differ (the overlay is doing work)
    raw = tok._tok.convert_tokens_to_ids("<img_00000>")
    assert raw != v.img_token_id(0)


def test_mixed_text_and_specials(hf_dir):
    tok = HFTokenizer(hf_dir)
    v = DEFAULT_VOCAB
    ids = tok.encode("hello <img><img_00000></img> world")
    assert v.boi in ids and v.eoi in ids and v.img_token_id(0) in ids
    span = ids.index(v.boi)
    assert ids[span:span + 3] == [v.boi, v.img_token_id(0), v.eoi]
    # text ids stay in the HF base range
    assert all(t < 32000 for t in ids[:span])
    # bos pinning
    assert tok.encode("hello", add_bos=True)[0] == tok.bos_token_id == 1
    assert tok.vocab_size >= v.vocab_size


def test_decode_roundtrip_and_strip(hf_dir):
    tok = HFTokenizer(hf_dir)
    v = DEFAULT_VOCAB
    ids = tok.encode("hello world <img><img_00001><img_00002></img>")
    text = tok.decode(ids)
    assert "hello" in text and "world" in text
    assert "<img_00001>" in text and "<img>" in text
    clean = tok.decode(ids, skip_special_tokens=True)
    assert "<img_" not in clean and "<img>" not in clean
    # out-of-fixture-vocab base ids (model can emit any id < 32000) decode
    # without raising
    assert isinstance(tok.decode([31999, 17, v.boi]), str)


def test_load_tokenizer_dispatch(hf_dir, tmp_path):
    assert isinstance(load_tokenizer(hf_dir), HFTokenizer)
    assert isinstance(load_tokenizer(None), ByteFallbackTokenizer)
    assert isinstance(load_tokenizer(str(tmp_path / "missing")),
                      ByteFallbackTokenizer)


def test_engine_parity_hf_vs_bytefallback(hf_dir):
    """The debug engine runs the full t2i flow through BOTH tokenizers:
    same constrained-decoding span structure, markup strips clean.  Text
    ids legitimately differ (different base vocabs); the special-token
    frame and the generation contract must not."""
    import dataclasses

    from seedx_tpu.inference import apps
    from seedx_tpu.inference.runtime import SeedXRuntime

    rt = SeedXRuntime.debug(with_adapter=False)
    outs = {}
    for name, tok in [("byte", rt.tokenizer), ("hf", HFTokenizer(hf_dir))]:
        rt2 = dataclasses.replace(rt, tokenizer=tok) \
            if dataclasses.is_dataclass(rt) else rt
        if rt2 is rt:
            rt.tokenizer = tok
        outs[name] = apps.text_to_image(rt2, "a red car",
                                        max_new_tokens=8, spec_k=0)
    for name, out in outs.items():
        assert "text" in out, name
        assert "<unk>" not in out["text"], name
    # the image-span contract (has_img_output + gen feature shape) is
    # tokenizer-independent: both runs made the same structural decision
    assert (outs["byte"]["has_img_output"]
            == outs["hf"]["has_img_output"])
