import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.agent import (_compact_rows, _gather_from_positions,
                                    _scatter_to_positions)
from seedx_tpu.models.generation import (GenerationConfig,
                                         constrain_image_tokens, generate)
from seedx_tpu.text import prompts
from seedx_tpu.text.tokenizer import ByteFallbackTokenizer
from seedx_tpu.text.vocab import DEFAULT_VOCAB


def test_compact_rows_packs_valid_slots():
    rows = jnp.arange(3 * 2 * 4, dtype=jnp.float32).reshape(3, 2, 4)
    mask = jnp.array([False, True, True])
    out = _compact_rows(rows, mask)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(rows[1]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(rows[2]))
    np.testing.assert_array_equal(np.asarray(out[2]), 0)


def test_scatter_gather_roundtrip():
    b, s, d = 2, 10, 4
    base = jnp.zeros((b, s, d))
    mask = jnp.zeros((b, s), bool).at[0, 2:4].set(True).at[1, 5:7].set(True)
    rows = jnp.arange(4 * d, dtype=jnp.float32).reshape(4, d) + 1.0
    out = _scatter_to_positions(base, mask, rows)
    # row-major order: (0,2)->row0, (0,3)->row1, (1,5)->row2, (1,6)->row3
    np.testing.assert_array_equal(np.asarray(out[0, 2]), np.asarray(rows[0]))
    np.testing.assert_array_equal(np.asarray(out[1, 6]), np.asarray(rows[3]))
    np.testing.assert_array_equal(np.asarray(out[0, 0]), 0)

    gathered = _gather_from_positions(out, mask, 2, 2)
    np.testing.assert_array_equal(np.asarray(gathered.reshape(4, d)),
                                  np.asarray(rows))


def test_agent_forward_losses(tiny_agent, tiny_agent_cfg):
    model, variables = tiny_agent
    cfg = tiny_agent_cfg
    B, S, N, T = 2, 80, 2, 256
    rng = jax.random.PRNGKey(1)
    ids = jax.random.randint(rng, (B, S), 0, 300)
    attn = jnp.ones((B, S), bool)
    labels = jnp.where(attn, ids, -100)
    image_embeds = jax.random.normal(rng, (N, T, cfg.vit_dim), jnp.bfloat16)
    embeds_cmp = jnp.array([True, False])
    embeds_gen = jnp.array([False, True])
    ids_cmp = jnp.zeros((B, S), bool).at[0, 1:65].set(True)
    ids_gen = jnp.zeros((B, S), bool).at[1, 2:66].set(True)
    patch_pos = jnp.full((N, 2), 0.5)

    out = model.apply(variables, ids, attn, labels, image_embeds, embeds_gen,
                      embeds_cmp, ids_gen, ids_cmp, patch_pos)
    assert np.isfinite(float(out["total_loss"]))
    assert float(out["lm_loss"]) > 0
    assert float(out["rec_loss"]) > 0
    expected = (cfg.lm_loss_scale * float(out["lm_loss"])
                + cfg.rec_loss_scale * float(out["rec_loss"]))
    assert abs(float(out["total_loss"]) - expected) < 1e-3


def test_agent_no_images_matches_pure_lm(tiny_agent):
    model, variables = tiny_agent
    B, S = 2, 80
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, 300)
    attn = jnp.ones((B, S), bool)
    labels = jnp.where(attn, ids, -100)
    zeros = jnp.zeros((B, S), bool)
    out = model.apply(variables, ids, attn, labels, None, None, None,
                      zeros, zeros, None)
    assert float(out["rec_loss"]) == 0.0
    assert float(out["lm_loss"]) > 0


def test_constrain_image_tokens_state_machine():
    v = DEFAULT_VOCAB
    n = 8
    vocab_size = v.vocab_size
    logits = jnp.zeros((1, vocab_size)).at[0, 5].set(3.0)

    # after <img>: forced to img_0
    out = constrain_image_tokens(jnp.array([v.boi]), logits, v, n)
    assert int(jnp.argmax(out[0])) == v.img_token_id(0)
    # after img_k: forced to img_{k+1}
    out = constrain_image_tokens(jnp.array([v.img_token_id(3)]), logits, v, n)
    assert int(jnp.argmax(out[0])) == v.img_token_id(4)
    # after img_{n-1}: forced to </img>
    out = constrain_image_tokens(jnp.array([v.img_token_id(n - 1)]), logits, v, n)
    assert int(jnp.argmax(out[0])) == v.eoi
    # unforced: image tokens zeroed, best normal token wins
    out = constrain_image_tokens(jnp.array([17]), logits, v, n)
    assert int(jnp.argmax(out[0])) == 5
    assert float(out[0, v.img_token_id(0)]) == 0.0
    assert float(out[0, v.eoi]) == 0.0


def test_generate_end_to_end_with_image_input(tiny_agent, tiny_agent_cfg):
    model, variables = tiny_agent
    cfg = tiny_agent_cfg
    tok = ByteFallbackTokenizer()
    prompt = prompts.comprehension_prompt("what?", num_patches=1)
    input_ids = [tok.bos_token_id] + tok.encode(prompt)
    cmp_mask = prompts.cmp_mask_from_ids(input_ids)
    assert cmp_mask.sum() == 64

    image_embeds = jax.random.normal(jax.random.PRNGKey(0),
                                     (1, 256, cfg.vit_dim), jnp.bfloat16)
    gen_cfg = GenerationConfig(max_new_tokens=8, prompt_buckets=(128,))
    res = generate(model, variables, tok, input_ids,
                   image_embeds=image_embeds,
                   embeds_cmp_mask=np.array([True]),
                   ids_cmp_mask=cmp_mask,
                   patch_positions=jnp.full((1, 2), 0.5),
                   gen_cfg=gen_cfg)
    assert isinstance(res["text"], str)
    assert res["tokens"].shape[0] <= 8


def test_generate_forced_image_span(tiny_agent, tiny_agent_cfg):
    """If the model emits <img>, the next n tokens must be the forced image
    sequence and img_gen_feat must be produced."""
    model, variables = tiny_agent
    cfg = tiny_agent_cfg
    tok = ByteFallbackTokenizer()
    v = tok.vocab

    # Force <img> as the first generated token by biasing: craft a prompt
    # ending right before image generation and patch the lm head is
    # impractical — instead seed the constrainer directly: a prompt whose
    # last token IS <img> forces the whole span.
    input_ids = [tok.bos_token_id] + tok.encode("make an image: ") + [v.boi]
    n = 4
    gen_cfg = GenerationConfig(max_new_tokens=n + 2, num_img_gen_tokens=n,
                               prompt_buckets=(128,))
    res = generate(model, variables, tok, input_ids, gen_cfg=gen_cfg)
    toks = list(res["tokens"])
    assert toks[:n] == [v.img_token_id(i) for i in range(n)]
    assert toks[n] == v.eoi
    assert res["has_img_output"]
    assert res["num_gen_imgs"] == 1
    assert res["img_gen_feat"].shape == (1, cfg.num_img_out_tokens, cfg.vit_dim)


def test_generate_batch_matches_single(tiny_agent, tiny_agent_cfg):
    """ONE batched launch must reproduce each single-prompt result row-for-row
    (greedy; rows are independent under the per-row kv masks)."""
    from seedx_tpu.models.generation import generate_batch

    model, variables = tiny_agent
    cfg = tiny_agent_cfg
    tok = ByteFallbackTokenizer()
    v = tok.vocab
    n = 4
    gen_cfg = GenerationConfig(max_new_tokens=n + 2, num_img_gen_tokens=n,
                               prompt_buckets=(128,))

    prompt = prompts.comprehension_prompt("what?", num_patches=1)
    img_ids = [tok.bos_token_id] + tok.encode(prompt)
    image_embeds = jax.random.normal(jax.random.PRNGKey(0),
                                     (1, 256, cfg.vit_dim), jnp.bfloat16)
    requests = [
        {"input_ids": img_ids,
         "image_embeds": image_embeds,
         "embeds_cmp_mask": np.array([True]),
         "ids_cmp_mask": prompts.cmp_mask_from_ids(img_ids),
         "patch_positions": jnp.full((1, 2), 0.5)},
        {"input_ids": [tok.bos_token_id] + tok.encode("hello world")},
        {"input_ids": [tok.bos_token_id] + tok.encode("make: ") + [v.boi]},
    ]
    batched = generate_batch(model, variables, tok, requests, gen_cfg=gen_cfg)
    assert len(batched) == 3

    singles = [
        generate(model, variables, tok, requests[0]["input_ids"],
                 image_embeds=image_embeds,
                 embeds_cmp_mask=np.array([True]),
                 ids_cmp_mask=requests[0]["ids_cmp_mask"],
                 patch_positions=jnp.full((1, 2), 0.5), gen_cfg=gen_cfg),
        generate(model, variables, tok, requests[1]["input_ids"],
                 gen_cfg=gen_cfg),
        generate(model, variables, tok, requests[2]["input_ids"],
                 gen_cfg=gen_cfg),
    ]
    for got, want in zip(batched, singles):
        assert list(got["tokens"]) == list(want["tokens"])
        assert got["text"] == want["text"]
        assert got["num_gen_imgs"] == want["num_gen_imgs"]
    # the forced-span row produced its image features inside the batch
    assert batched[2]["has_img_output"]
    assert batched[2]["img_gen_feat"].shape == (
        1, cfg.num_img_out_tokens, cfg.vit_dim)
    # bf16: batch-size-dependent reduction tiling shifts the last ULP
    np.testing.assert_allclose(
        np.asarray(batched[2]["img_gen_feat"], np.float32),
        np.asarray(singles[2]["img_gen_feat"], np.float32),
        atol=2e-3)


def test_beam_search_k1_matches_greedy(tiny_agent):
    from seedx_tpu.models.generation import (_backtrack_beam,
                                             generate_tokens_beam,
                                             generate_tokens)

    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    gen_cfg = GenerationConfig(max_new_tokens=6, num_img_gen_tokens=4,
                               prompt_buckets=(128,), num_beams=1)
    ids = [tok.bos_token_id] + tok.encode("the quick brown")
    pad = 128 - len(ids)
    ids_p = jnp.asarray([[tok.pad_token_id] * pad + ids])
    mask = jnp.asarray([[False] * pad + [True] * len(ids)])
    embeds = model.apply(variables, ids_p, method="embed_ids")
    last = jnp.asarray([ids[-1]], jnp.int32)

    greedy = generate_tokens(model, variables, embeds, mask, last,
                             jax.random.PRNGKey(0), gen_cfg, tok.vocab)
    beam = generate_tokens_beam(model, variables, embeds, mask, last,
                                gen_cfg, tok.vocab)
    seq, hidden, best = _backtrack_beam(beam, gen_cfg, 0)
    assert list(seq) == list(np.asarray(greedy["tokens"])[0])
    np.testing.assert_allclose(np.asarray(hidden, np.float32),
                               np.asarray(greedy["hidden"][0], np.float32),
                               atol=1e-3)


def test_beam_search_scores_beat_greedy(tiny_agent):
    """K=4 best-path cumulative log-prob must be >= the greedy path's."""
    from seedx_tpu.models.generation import (generate_tokens,
                                             generate_tokens_beam)

    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    cfgk = GenerationConfig(max_new_tokens=6, num_img_gen_tokens=4,
                            prompt_buckets=(128,), num_beams=4)
    ids = [tok.bos_token_id] + tok.encode("hello")
    pad = 128 - len(ids)
    ids_p = jnp.asarray([[tok.pad_token_id] * pad + ids])
    mask = jnp.asarray([[False] * pad + [True] * len(ids)])
    embeds = model.apply(variables, ids_p, method="embed_ids")
    last = jnp.asarray([ids[-1]], jnp.int32)

    cfg1 = GenerationConfig(max_new_tokens=6, num_img_gen_tokens=4,
                            prompt_buckets=(128,), num_beams=1)
    b1 = generate_tokens_beam(model, variables, embeds, mask, last, cfg1,
                              tok.vocab)
    bk = generate_tokens_beam(model, variables, embeds, mask, last, cfgk,
                              tok.vocab)
    assert float(np.max(np.asarray(bk["scores"]))) >= \
        float(np.max(np.asarray(b1["scores"]))) - 1e-4


def test_beam_search_forced_image_span(tiny_agent, tiny_agent_cfg):
    """The image-token constrainer applies per beam: a prompt ending in
    <img> must force the span on the winning beam too."""
    model, variables = tiny_agent
    cfg = tiny_agent_cfg
    tok = ByteFallbackTokenizer()
    v = tok.vocab
    n = 4
    gen_cfg = GenerationConfig(max_new_tokens=n + 2, num_img_gen_tokens=n,
                               prompt_buckets=(128,), num_beams=3)
    input_ids = [tok.bos_token_id] + tok.encode("img: ") + [v.boi]
    res = generate(model, variables, tok, input_ids, gen_cfg=gen_cfg)
    toks = list(res["tokens"])
    assert toks[:n] == [v.img_token_id(i) for i in range(n)]
    assert res["has_img_output"] and res["num_gen_imgs"] == 1
    assert res["img_gen_feat"].shape == (1, cfg.num_img_out_tokens,
                                         cfg.vit_dim)
