import numpy as np

from seedx_tpu.text import prompts
from seedx_tpu.text.tokenizer import ByteFallbackTokenizer
from seedx_tpu.text.vocab import DEFAULT_VOCAB, MultimodalVocab


def test_vocab_layout():
    v = DEFAULT_VOCAB
    assert v.vocab_size == 32330  # llm_seed_x_lora.yaml:25
    assert v.img_token_id(0) == 32000
    assert v.img_token_id(99) == 32099
    assert v.loc_token_id(0) == 32100
    assert v.loc_token_id(223) == 32323
    assert v.boi == 32324 and v.eoi == 32325
    assert v.box_end == 32329
    assert len(v.special_token_strings()) == 330


def test_vocab_token_roundtrip():
    v = DEFAULT_VOCAB
    for t in ["<img_00007>", "<loc-42>", "<img>", "</img>", "<patch>",
              "</patch>", "<box_start>", "<box_end>"]:
        assert v.id_to_token(v.token_id(t)) == t


def test_byte_tokenizer_roundtrip():
    tok = ByteFallbackTokenizer()
    text = "hello <img><img_00000><img_00001></img> world <loc-5>"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert tok.decode(ids, skip_special_tokens=True) == "hello  world "


def test_byte_tokenizer_bos():
    tok = ByteFallbackTokenizer()
    ids = tok.encode("hi", add_bos=True)
    assert ids[0] == tok.bos_token_id


def test_comprehension_prompt_structure():
    v = DEFAULT_VOCAB
    tok = ByteFallbackTokenizer()
    p = prompts.comprehension_prompt("what?", num_patches=3, num_tokens=64)
    ids = tok.encode(p)
    ids_np = np.array(ids)
    # 2 patch spans + 1 image span (reference: eval_img2text_seed_x_i.py:143-146)
    assert (ids_np == v.bop).sum() == 2
    assert (ids_np == v.boi).sum() == 1
    mask = prompts.cmp_mask_from_ids(ids)
    assert mask.sum() == 3 * 64


def test_box_extraction_and_scaling():
    text = ("here <box_start><loc-112><loc-112><loc-56><loc-56><box_end> ok")
    boxes = prompts.extract_boxes(text)
    assert boxes == [(112, 112, 56, 56)]
    px = prompts.boxes_to_pixels(boxes, 448, 448)
    assert px == [(168, 168, 280, 280)]
    assert prompts.extract_boxes("no boxes") is None


def test_draw_boxes_renders_rectangles():
    """Grounding renders predicted boxes onto the image (reference:
    eval_img2text_seed_x_i.py:16-36,228-231)."""
    from PIL import Image

    from seedx_tpu.inference.apps import draw_boxes

    img = Image.new("RGB", (448, 448), (0, 0, 0))
    vis = draw_boxes(img, [(168, 168, 280, 280)])
    arr = np.asarray(vis)
    assert tuple(arr[168, 224]) == (0, 255, 0)      # top edge
    assert tuple(arr[224, 168]) == (0, 255, 0)      # left edge
    assert tuple(arr[224, 224]) == (0, 0, 0)        # interior untouched
    assert np.asarray(img).sum() == 0               # input not mutated


def test_strip_markup():
    assert prompts.strip_markup("a<img>b</img>c<loc-3>") == "abc"


def test_custom_vocab_sizes():
    v = MultimodalVocab(base_vocab_size=1000, num_img_tokens=10,
                        num_loc_tokens=5)
    assert v.vocab_size == 1021
    assert v.boi == 1015
