"""n-gram speculative decoding: exactness vs the plain greedy engine.

The spec path (generation.py `spec_step`) must emit token-identical output
to the non-speculative engine — it only re-batches the weight stream, never
changes the sequence.  (No reference counterpart: the reference's HF loop
is strictly one token per forward, seed_x.py:184-189.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.generation import (GenerationConfig, _ngram_draft,
                                         generate)
from seedx_tpu.text.tokenizer import ByteFallbackTokenizer


def test_ngram_draft_finds_previous_continuation():
    # history: ... 5 6 7 8 9 ... 5 6 | next token0=7 -> drafts 8 9
    hist = jnp.asarray([1, 5, 6, 7, 8, 9, 2, 3, 5, 6, -1, -1, -1, -1],
                       jnp.int32)
    m = 10                      # filled through index 9 (the second "6")
    drafts = _ngram_draft(hist, m, jnp.int32(7), k=3, ngram=3)
    np.testing.assert_array_equal(np.asarray(drafts), [8, 9, 2])


def test_ngram_draft_higher_order():
    # 4-gram: tail (2,3,4,token0=5) must match all four positions
    hist = jnp.asarray([9, 2, 3, 4, 5, 6, 7, 1, 2, 3, 4, -1, -1, -1],
                       jnp.int32)
    drafts = _ngram_draft(hist, 11, jnp.int32(5), k=2, ngram=4)
    np.testing.assert_array_equal(np.asarray(drafts), [6, 7])
    # but a 4-gram with a broken earlier token must NOT match
    hist2 = jnp.asarray([9, 9, 3, 4, 5, 6, 7, 1, 2, 3, 4, -1, -1, -1],
                        jnp.int32)
    drafts2 = _ngram_draft(hist2, 11, jnp.int32(5), k=2, ngram=4)
    np.testing.assert_array_equal(np.asarray(drafts2), [-1, -1])


def test_ngram_draft_no_match_returns_sentinel():
    hist = jnp.asarray([1, 2, 3, 4, -1, -1], jnp.int32)
    drafts = _ngram_draft(hist, 4, jnp.int32(9), k=2, ngram=3)
    np.testing.assert_array_equal(np.asarray(drafts), [-1, -1])


def test_ngram_draft_ignores_unfilled_region():
    # the only trigram match would be inside the not-yet-generated region
    hist = jnp.asarray([1, 2, 3, 7, 2, 3, -1, -1], jnp.int32)
    # m=4: filled is [1,2,3,7]; tail bigram (3, token0=7) matched at j=3
    # which is NOT < m... j must be < m, and j=3 < 4 holds -> but then the
    # draft window starts at 4 whose entries ARE filled here; use m=4 with
    # token0 that only matches at j >= m to check the idx < m guard:
    drafts = _ngram_draft(hist, 4, jnp.int32(3), k=2, ngram=2)
    # tail bigram is (7, 3): hist[j]==3 & hist[j-1]==7 only at j=5 >= m
    np.testing.assert_array_equal(np.asarray(drafts), [-1, -1])


def _gen(model, variables, tok, ids, gen_cfg, **kw):
    res = generate(model, variables, tok, ids, gen_cfg=gen_cfg, **kw)
    return res


def test_spec_decode_matches_greedy_text(tiny_agent):
    """Repetitive prompt (high n-gram hit rate) — token-exact parity."""
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    ids = [tok.bos_token_id] + tok.encode(
        "the cat sat on the mat. the cat sat on the mat. the cat")

    base_cfg = GenerationConfig(max_new_tokens=24, num_img_gen_tokens=4,
                                prompt_buckets=(128,))
    spec_cfg = GenerationConfig(max_new_tokens=24, num_img_gen_tokens=4,
                                prompt_buckets=(128,), spec_k=4)
    want = _gen(model, variables, tok, ids, base_cfg)
    got = _gen(model, variables, tok, ids, spec_cfg)
    assert list(got["tokens"]) == list(want["tokens"])
    assert got["text"] == want["text"]


def test_spec_decode_matches_greedy_image_span(tiny_agent, tiny_agent_cfg):
    """Forced image span: spec rounds hand over to the chunk path at <img>
    and the span + hidden-state harvest stay aligned."""
    model, variables = tiny_agent
    cfg = tiny_agent_cfg
    tok = ByteFallbackTokenizer()
    v = tok.vocab
    ids = [tok.bos_token_id] + tok.encode("make an image: ") + [v.boi]
    n = 4

    base_cfg = GenerationConfig(max_new_tokens=n + 2, num_img_gen_tokens=n,
                                prompt_buckets=(128,))
    spec_cfg = GenerationConfig(max_new_tokens=n + 2, num_img_gen_tokens=n,
                                prompt_buckets=(128,), spec_k=3)
    want = _gen(model, variables, tok, ids, base_cfg)
    got = _gen(model, variables, tok, ids, spec_cfg)
    assert list(got["tokens"]) == list(want["tokens"])
    assert got["tokens"][:n].tolist() == [v.img_token_id(i) for i in range(n)]
    assert got["has_img_output"] and want["has_img_output"]
    # bf16: block-width-dependent reduction tiling shifts the last ULP
    np.testing.assert_allclose(np.asarray(got["img_gen_feat"], np.float32),
                               np.asarray(want["img_gen_feat"], np.float32),
                               atol=2e-3)


def test_spec_decode_various_k(tiny_agent):
    """Parity must hold for every draft length, including k past the
    match window."""
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    ids = [tok.bos_token_id] + tok.encode("abc abc abc ab")
    base = _gen(model, variables, tok, ids,
                GenerationConfig(max_new_tokens=12, num_img_gen_tokens=4,
                                 prompt_buckets=(128,)))
    for k in (1, 2, 8):
        got = _gen(model, variables, tok, ids,
                   GenerationConfig(max_new_tokens=12, num_img_gen_tokens=4,
                                    prompt_buckets=(128,), spec_k=k))
        assert list(got["tokens"]) == list(base["tokens"]), k


def test_spec_decode_disabled_for_batch_and_sampling(tiny_agent):
    """spec_k must silently no-op for B>1 and do_sample (the gate in
    generate_tokens) — same outputs, no error."""
    from seedx_tpu.models.generation import generate_batch
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    reqs = [{"input_ids": [tok.bos_token_id] + tok.encode("hello world")},
            {"input_ids": [tok.bos_token_id] + tok.encode("abc abc abc")}]
    cfg0 = GenerationConfig(max_new_tokens=8, num_img_gen_tokens=4,
                            prompt_buckets=(128,))
    cfgk = GenerationConfig(max_new_tokens=8, num_img_gen_tokens=4,
                            prompt_buckets=(128,), spec_k=4)
    want = generate_batch(model, variables, tok, reqs, gen_cfg=cfg0)
    got = generate_batch(model, variables, tok, reqs, gen_cfg=cfgk)
    for g, w in zip(got, want):
        assert list(g["tokens"]) == list(w["tokens"])


def test_cached_engine_spec_matches_plain_with_image_span(tiny_agent):
    """Direct generate_tokens_cached parity: spec rounds at absolute cache
    positions, including the spec->chunk handover when the model emits
    <img>, and a second segment reusing the first turn's cached prefix."""
    import jax
    from seedx_tpu.models.generation import generate_tokens_cached
    from seedx_tpu.models.llama import init_kv_cache

    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    v = tok.vocab
    n = 4
    t = n + 3
    cap = 256

    def run(spec_k):
        cfg = GenerationConfig(max_new_tokens=t, num_img_gen_tokens=n,
                               spec_k=spec_k)
        cache = init_kv_cache(model.cfg.llm, 1, cap)
        # turn 1: prompt ending in <img> -> forced span fires immediately
        ids1 = [tok.bos_token_id] + tok.encode("make: ") + [v.boi]
        sb = 32
        padded = np.zeros((1, sb), np.int32)
        padded[0, :len(ids1)] = ids1
        emb = model.apply(variables, jnp.asarray(padded),
                          method="embed_ids")
        hist = None
        if spec_k:
            h = np.full((cap,), -1, np.int32)
            h[:len(ids1)] = ids1
            hist = jnp.asarray(h)
        out1, cache, total1 = generate_tokens_cached(
            model, variables, cache, emb, jnp.int32(0),
            jnp.int32(len(ids1)), jnp.int32(ids1[-1]),
            jax.random.PRNGKey(0), cfg, v, hist_ids=hist)
        # turn 2: history + generated span + new text, delta-prefill from lcp
        gen1 = [int(x) for x in np.asarray(out1["tokens"][0])]
        ids2 = ids1 + gen1[:int(total1) - len(ids1)] + tok.encode(" more")
        lcp = len(ids1)
        delta = ids2[lcp:]
        padded2 = np.zeros((1, sb), np.int32)
        padded2[0, :len(delta)] = delta
        emb2 = model.apply(variables, jnp.asarray(padded2),
                           method="embed_ids")
        hist2 = None
        if spec_k:
            h = np.full((cap,), -1, np.int32)
            h[:len(ids2)] = ids2
            hist2 = jnp.asarray(h)
        out2, cache, _ = generate_tokens_cached(
            model, variables, cache, emb2, jnp.int32(lcp),
            jnp.int32(len(delta)), jnp.int32(ids2[-1]),
            jax.random.PRNGKey(0), cfg, v, hist_ids=hist2)
        return (np.asarray(out1["tokens"]), np.asarray(out2["tokens"]))

    p1, p2 = run(0)
    s1, s2 = run(3)
    np.testing.assert_array_equal(p1, s1)
    np.testing.assert_array_equal(p2, s2)
    # the forced image span really fired in turn 1
    assert list(p1[0][:n]) == [v.img_token_id(i) for i in range(n)]


def test_spec_adaptive_gate_disables_below_breakeven(tiny_agent):
    """Adaptive policy (VERDICT r3 item 7): with an impossible acceptance
    bar the engine probes spec_probe_rounds rounds, then falls back to
    plain decode — spec_rounds stops at the probe count, and the emitted
    tokens are STILL the exact greedy sequence."""
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    ids = [tok.bos_token_id] + tok.encode("adversarial zqx vw kjh unique")

    base_cfg = GenerationConfig(max_new_tokens=24, num_img_gen_tokens=4,
                                prompt_buckets=(128,))
    spec_cfg = GenerationConfig(max_new_tokens=24, num_img_gen_tokens=4,
                                prompt_buckets=(128,), spec_k=4,
                                spec_adaptive=True, spec_probe_rounds=3,
                                spec_min_accept=5.0)   # unreachable bar
    want = _gen(model, variables, tok, ids, base_cfg)
    got = _gen(model, variables, tok, ids, spec_cfg)
    assert list(got["tokens"]) == list(want["tokens"])
    assert got["spec_rounds"] == 3          # probed, then shut off
    # overhead bound: everything after the probe was plain single steps


def test_spec_adaptive_keeps_speculating_when_accepting(tiny_agent):
    """A zero bar keeps the gate open: every round is speculative
    (spec_rounds grows past the probe), still token-exact."""
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    ids = [tok.bos_token_id] + tok.encode(
        "the cat sat on the mat. the cat sat on the mat. the cat")

    base_cfg = GenerationConfig(max_new_tokens=24, num_img_gen_tokens=4,
                                prompt_buckets=(128,))
    spec_cfg = GenerationConfig(max_new_tokens=24, num_img_gen_tokens=4,
                                prompt_buckets=(128,), spec_k=4,
                                spec_adaptive=True, spec_probe_rounds=2,
                                spec_min_accept=0.0)
    want = _gen(model, variables, tok, ids, base_cfg)
    got = _gen(model, variables, tok, ids, spec_cfg)
    assert list(got["tokens"]) == list(want["tokens"])
    assert got["spec_rounds"] > 2
    assert 0 <= got["spec_accepted"] <= 4 * got["spec_rounds"]


# ---- script forcing (workload-replay benches) -----------------------------

def _run_script(model, variables, tok, prompt_ids, script, gen_cfg):
    """Drive generate_tokens directly with script forcing (B=1)."""
    from seedx_tpu.models.generation import generate_tokens

    pad = 128 - len(prompt_ids)
    ids_p = jnp.asarray([[tok.pad_token_id] * pad + prompt_ids])
    mask = jnp.asarray([[False] * pad + [True] * len(prompt_ids)])
    embeds = model.apply(variables, ids_p, method="embed_ids")
    last = jnp.asarray([prompt_ids[-1]], jnp.int32)
    return generate_tokens(model, variables, embeds, mask, last,
                           jax.random.PRNGKey(0), gen_cfg, tok.vocab,
                           prompt_ids=ids_p,
                           script_ids=jnp.asarray(script, jnp.int32))


def test_script_forcing_emits_script_plain(tiny_agent):
    """spec_k=0: the emitted stream IS the script, token for token."""
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    ids = [tok.bos_token_id] + tok.encode("describe the scene")
    script = tok.encode("a quick brown fox jumps over the lazy dog today")
    cfg = GenerationConfig(max_new_tokens=len(script), num_img_gen_tokens=4,
                           prompt_buckets=(128,))
    out = _run_script(model, variables, tok, ids, script, cfg)
    assert list(np.asarray(out["tokens"])[0]) == list(script)


def _replay_acceptance(prompt_ids, script, k=4, ngram=3, bucket=128):
    """Offline replay of always-on spec acceptance over a scripted stream
    (the model-free ground truth the engine must reproduce exactly)."""
    p, t = bucket, len(script)
    hist = np.full((p + t,), -1, np.int64)
    hist[p - len(prompt_ids):p] = prompt_ids
    n = rounds = accepted = 0
    while n < t:
        drafts = np.asarray(_ngram_draft(
            jnp.asarray(hist, jnp.int32), p + n, jnp.int32(script[n]),
            k, ngram))
        a = 0
        while (a < k and n + 1 + a < t
               and drafts[a] == script[n + 1 + a]):
            a += 1
        hist[p + n:p + n + a + 1] = script[n:n + a + 1]
        n += a + 1
        rounds, accepted = rounds + 1, accepted + a
    return rounds, accepted


def test_script_forcing_spec_emits_script_and_accepts_echo(tiny_agent):
    """spec_k=4 on an echoing script: emission is still exactly the script,
    and the engine's (rounds, accepted) counters match the offline
    acceptance replay EXACTLY — the chip workload bench rests on this
    equivalence (forcing makes the random-weight model 'emit' the workload
    stream while every verify forward stays real)."""
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    phrase = "the subscription renewals in the enterprise segment grew. "
    ids = [tok.bos_token_id] + tok.encode("[INST] " + phrase + "[/INST]")
    assert len(ids) <= 128
    script = tok.encode(phrase * 2)
    cfg = GenerationConfig(max_new_tokens=len(script), num_img_gen_tokens=4,
                           prompt_buckets=(128,), spec_k=4,
                           spec_adaptive=False)
    out = _run_script(model, variables, tok, ids, script, cfg)
    assert list(np.asarray(out["tokens"])[0]) == list(script)
    rounds, accepted = _replay_acceptance(ids, script)
    assert int(out["spec_rounds"]) == rounds
    assert int(out["spec_accepted"]) == accepted
    assert accepted >= int(0.5 * len(script))   # echo accepts richly

    # the adaptive gate on the same stream: still script-exact; the probe
    # window at the novel script head gates off once (designed reprobe
    # behavior), so acceptance is below always-on but well above zero
    cfg_ad = GenerationConfig(max_new_tokens=len(script),
                              num_img_gen_tokens=4, prompt_buckets=(128,),
                              spec_k=4, spec_adaptive=True, spec_reprobe=12)
    out_ad = _run_script(model, variables, tok, ids, script, cfg_ad)
    assert list(np.asarray(out_ad["tokens"])[0]) == list(script)
    assert int(out_ad["spec_accepted"]) > 0


def test_script_forcing_spec_gates_off_on_adversarial(tiny_agent):
    """Unique never-repeating script: drafting never matches, the windowed
    gate shuts speculation off after the probe window (plus bounded
    re-probes), and the emission is still exactly the script."""
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    ids = [tok.bos_token_id] + tok.encode("list codes")
    script = tok.encode(" ".join(f"zq{i}" for i in range(14)))[:40]
    cfg = GenerationConfig(max_new_tokens=len(script), num_img_gen_tokens=4,
                           prompt_buckets=(128,), spec_k=4,
                           spec_adaptive=True, spec_probe_rounds=4,
                           spec_reprobe=48)
    out = _run_script(model, variables, tok, ids, script, cfg)
    assert list(np.asarray(out["tokens"])[0]) == list(script)
    assert int(out["spec_accepted"]) == 0
    # probe(4) + at most one re-probe window inside 40 steps
    assert int(out["spec_rounds"]) <= 8


def test_script_forcing_gate_recovers_after_cooldown(tiny_agent):
    """Regression (r5 history-holes fix): a novel script head gates
    speculation off; the echo phrase's FIRST occurrence is then emitted by
    plain fallback steps.  Those steps MUST extend the n-gram history —
    with holes there, the post-cooldown re-probe drafts against garbage
    keys and acceptance never recovers (chip: grounding adaptive stuck at
    22 rounds/8 accepted vs the policy's intended 72/104)."""
    model, variables = tiny_agent
    tok = ByteFallbackTokenizer()
    ids = [tok.bos_token_id] + tok.encode("write the report")
    junk = tok.encode(" ".join(f"xk{i}" for i in range(8)))[:20]
    phrase = tok.encode("metric alpha beta gamma delta rose sharply again. ")
    script = list(junk) + list(phrase) * 3
    cfg = GenerationConfig(max_new_tokens=len(script), num_img_gen_tokens=4,
                           prompt_buckets=(128,), spec_k=4,
                           spec_adaptive=True, spec_probe_rounds=4,
                           spec_reprobe=12)
    out = _run_script(model, variables, tok, ids, script, cfg)
    assert list(np.asarray(out["tokens"])[0]) == list(script)
    # the re-probe lands inside the echo region whose first occurrence was
    # emitted by gated-off plain steps; with an intact history the gate
    # re-enables and accepts richly (with holes, accepted stays ~0)
    assert int(out["spec_accepted"]) >= len(phrase), (
        int(out["spec_accepted"]), int(out["spec_rounds"]))
