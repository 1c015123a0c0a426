"""Numerical parity: seedx_tpu LLaMA vs the installed HF torch LLaMA.

The reference backbone is a fork of transformers' LlamaForCausalLM
(reference: src/models/mllm/modeling_llama_xformer.py — same RoPE/RMSNorm/
SwiGLU/CE semantics, only the attention kernel swapped).  Using the
installed torch implementation as an independent oracle validates BOTH our
model math and the HF->JAX weight converter end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seedx_tpu.models.llama import (LlamaForCausalLM, causal_lm_loss,
                                    llama_debug)
from seedx_tpu.utils.weights import convert_llama_hf


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import \
        LlamaForCausalLM as HFLlama

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=500, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = HFLlama(hf_cfg).eval().to(torch.float32)

    sd = {k: v for k, v in hf.state_dict().items()}
    params = convert_llama_hf(sd, num_layers=2, vocab_size=500)

    cfg = llama_debug(vocab_size=500, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      attention_impl="xla")
    model = LlamaForCausalLM(cfg)
    return hf, model, params


def test_logits_match_hf(hf_pair):
    hf, model, params = hf_pair
    B, S = 2, 12
    ids = torch.randint(0, 500, (B, S))
    with torch.no_grad():
        ref = hf(input_ids=ids).logits.numpy()

    jids = jnp.asarray(ids.numpy())
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    embeds = model.apply({"params": params}, jids, method="embed")
    logits, _, _ = model.apply({"params": params}, embeds, positions,
                               jnp.ones((B, S), bool))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-3)


def test_loss_matches_hf(hf_pair):
    hf, model, params = hf_pair
    B, S = 2, 12
    ids = torch.randint(0, 500, (B, S))
    labels = ids.clone()
    labels[:, :3] = -100
    with torch.no_grad():
        ref_loss = float(hf(input_ids=ids, labels=labels).loss)

    jids = jnp.asarray(ids.numpy())
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    embeds = model.apply({"params": params}, jids, method="embed")
    logits, _, _ = model.apply({"params": params}, embeds, positions,
                               jnp.ones((B, S), bool))
    loss = float(causal_lm_loss(logits, jnp.asarray(labels.numpy())))
    assert abs(loss - ref_loss) < 5e-3


def test_greedy_decode_matches_hf(hf_pair):
    """Greedy continuations agree token-for-token (the text-parity criterion
    from SURVEY.md §7 hard parts: do_sample=False makes this exact)."""
    hf, model, params = hf_pair
    from seedx_tpu.models.llama import init_kv_cache

    B, P, T = 1, 8, 12
    prompt = torch.randint(0, 500, (B, P))
    with torch.no_grad():
        ref = hf.generate(prompt, max_new_tokens=T, do_sample=False,
                          pad_token_id=0)[0, P:].numpy()

    cfg = model.cfg
    total = P + T
    cache = init_kv_cache(cfg, B, total)
    jids = jnp.asarray(prompt.numpy())
    positions = jnp.broadcast_to(jnp.arange(P), (B, P))
    embeds = model.apply({"params": params}, jids, method="embed")
    kv_valid = jnp.arange(total)[None, :] < P
    logits, _, cache = model.apply({"params": params}, embeds, positions,
                                   kv_valid, cache, 0)
    token = jnp.argmax(logits[:, -1], -1)
    out = [int(token[0])]
    for t in range(1, T):
        emb = model.apply({"params": params}, token[:, None], method="embed")
        kv_valid = jnp.arange(total)[None, :] < P + t
        lg, _, cache = model.apply({"params": params}, emb,
                                   jnp.full((B, 1), P + t - 1), kv_valid,
                                   cache, P + t - 1)
        token = jnp.argmax(lg[:, 0], -1)
        out.append(int(token[0]))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sequence_classification_matches_hf(hf_pair):
    """Sequence-classification head vs the HF torch oracle, including the
    last-non-pad-token selection semantics on right-padded batches
    (reference: modeling_llama_xformer.py:804-919)."""
    from transformers import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import \
        LlamaForSequenceClassification as HFSeqCls

    from seedx_tpu.models.llama import LlamaForSequenceClassification

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        vocab_size=500, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager", num_labels=3, pad_token_id=0)
    hf = HFSeqCls(hf_cfg).eval().to(torch.float32)
    sd = {k: v for k, v in hf.state_dict().items()}

    # trunk + embedding through the standard converter (dummy lm_head)
    sd_conv = dict(sd)
    sd_conv["lm_head.weight"] = torch.zeros(500, 64)
    conv = convert_llama_hf(sd_conv, num_layers=2, vocab_size=500)
    params = {"embed_tokens": conv["embed_tokens"], "model": conv["model"],
              "score": {"kernel": np.asarray(sd["score.weight"]).T}}

    cfg = llama_debug(vocab_size=500, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      attention_impl="xla")
    model = LlamaForSequenceClassification(cfg, num_labels=3)

    B, S = 3, 10
    lens = [10, 7, 4]
    ids = torch.randint(1, 500, (B, S))
    for i, n in enumerate(lens):
        ids[i, n:] = 0                               # right padding
    attn = torch.zeros((B, S), dtype=torch.long)
    for i, n in enumerate(lens):
        attn[i, :n] = 1
    with torch.no_grad():
        ref = hf(input_ids=ids, attention_mask=attn).logits.numpy()

    out = model.apply({"params": params}, jnp.asarray(ids.numpy()),
                      jnp.asarray(attn.numpy()).astype(bool))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


def test_beam_search_matches_hf_generate(hf_pair):
    """Beam search (num_beams=3, length_penalty=1.0) vs HF torch
    ``generate`` on converted weights: token-exact (the reference carries
    HF's beam knobs in its configs even though its scripts run greedy)."""
    import jax
    from flax import linen as nn

    from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
    from seedx_tpu.models.generation import GenerationConfig, generate_batch
    from seedx_tpu.text.tokenizer import load_tokenizer

    hf, _, params = hf_pair
    cfg = llama_debug(vocab_size=500, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      attention_impl="xla")
    agent_cfg = AgentConfig(llm=cfg, vit_dim=16, resampler_heads=2,
                            num_img_in_tokens=4, num_img_out_tokens=4,
                            vit_down=False)
    agent = ContinuousLVLM(agent_cfg)
    av = agent.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                    jnp.ones((1, 8), bool), jnp.zeros((1, 8), jnp.int32),
                    jnp.zeros((1, 4, 16), jnp.float32),
                    jnp.zeros((1,), bool), jnp.zeros((1,), bool),
                    jnp.zeros((1, 8), bool), jnp.zeros((1, 8), bool),
                    jnp.full((1, 2), 0.5), method="init_all")
    aparams = nn.meta.unbox(av["params"])
    aparams["llm"] = params

    tok = load_tokenizer()
    for ids in ([1, 17, 42, 99, 7], [1, 3, 250, 111]):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([ids]), max_new_tokens=8,
                              num_beams=3, do_sample=False,
                              length_penalty=1.0,
                              early_stopping=False)[0].tolist()[len(ids):]
        gen_cfg = GenerationConfig(max_new_tokens=8, num_beams=3,
                                   num_img_gen_tokens=4, eos_token_id=2,
                                   pad_token_id=0)
        res = generate_batch(agent, {"params": aparams}, tok, [
            {"input_ids": ids, "image_embeds": None, "embeds_cmp_mask": None,
             "ids_cmp_mask": None, "patch_positions": None}],
            gen_cfg=gen_cfg)[0]
        assert [int(x) for x in res["tokens"]] == ref, ids


def test_greedy_generate_matches_hf(hf_pair):
    """Greedy decode (the reference's inference default, seed_x.py:180) vs
    HF torch ``generate``: token-exact, including EOS stopping."""
    import jax
    from flax import linen as nn

    from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
    from seedx_tpu.models.generation import GenerationConfig, generate_batch
    from seedx_tpu.text.tokenizer import load_tokenizer

    hf, _, params = hf_pair
    cfg = llama_debug(vocab_size=500, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      attention_impl="xla")
    agent_cfg = AgentConfig(llm=cfg, vit_dim=16, resampler_heads=2,
                            num_img_in_tokens=4, num_img_out_tokens=4,
                            vit_down=False)
    agent = ContinuousLVLM(agent_cfg)
    av = agent.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                    jnp.ones((1, 8), bool), jnp.zeros((1, 8), jnp.int32),
                    jnp.zeros((1, 4, 16), jnp.float32),
                    jnp.zeros((1,), bool), jnp.zeros((1,), bool),
                    jnp.zeros((1, 8), bool), jnp.zeros((1, 8), bool),
                    jnp.full((1, 2), 0.5), method="init_all")
    aparams = nn.meta.unbox(av["params"])
    aparams["llm"] = params

    tok = load_tokenizer()
    for ids in ([1, 17, 42, 99, 7], [1, 444, 3, 9, 10, 200]):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([ids]), max_new_tokens=10,
                              do_sample=False,
                              num_beams=1)[0].tolist()[len(ids):]
        gen_cfg = GenerationConfig(max_new_tokens=10, num_img_gen_tokens=4,
                                   eos_token_id=2, pad_token_id=0)
        res = generate_batch(agent, {"params": aparams}, tok, [
            {"input_ids": ids, "image_embeds": None, "embeds_cmp_mask": None,
             "ids_cmp_mask": None, "patch_positions": None}],
            gen_cfg=gen_cfg)[0]
        got = [int(x) for x in res["tokens"]]
        assert got == ref[:len(got)] and len(got) >= min(len(ref), 10), ids
