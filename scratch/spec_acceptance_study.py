"""Speculative-decoding acceptance on realistic SEED-X workloads
(VERDICT r3 item 7, the measurement half; the adaptive gate itself is
models/generation.py spec_adaptive + tests/test_spec_decode.py).

Method: prompt-lookup (n-gram) drafting is model-free — the draft is a
pure function of (token history, draft scheme), and greedy verification
accepts exactly the drafts that match the model's true continuation.  So
E[accepted]/round on a workload is a property of the TOKEN STREAM the
model would emit, measurable without the released 13B weights: we replay
the exact ``_ngram_draft`` + accept rule of models/generation.py over
realistic transcripts (tokenized by the serving tokenizer) and count.

Workloads (modeled on the reference's eval prompts):
  * grounding  — detection-style answers packed with repeated
    ``<box_start><loc-k>*4<box_end>`` markup
    (reference: src/inference/eval_img2text_seed_x_i.py:23-27, the
    "describe + ground every object" flow)
  * doc_qa     — answers quoting prompt passages verbatim (slides/PDF
    comprehension, reference sft data mix)
  * chat_echo  — multi-turn chat whose later turns revisit earlier
    phrasing (the prefix-cache chat path's prime workload)
  * story      — free-form novel prose (weak self-similarity)
  * adversarial— unique never-repeating text (worst case; r3 measured
    below breakeven here)

Throughput model uses the r3 chip measurements (PARITY.md decode row):
plain 82.1 tok/s, spec 45.6 rounds/s at k=4 (k=4 verify ~= the measured
cost regardless of acceptance).  Adaptive gate replays the engine's
policy (probe spec_probe_rounds, stay on while accepted >= 0.8*rounds).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scratch/spec_acceptance_study.py
"""
import json

import numpy as np

from seedx_tpu.text.tokenizer import ByteFallbackTokenizer

PLAIN_TOKS = 82.1      # measured plain B=1 int4 decode, r3 TPU session
SPEC_ROUNDS = 45.6     # measured k=4 spec rounds/s, same session
K, NGRAM = 4, 3
EOS = -999             # no eos inside these streams


def ngram_draft(hist, m, token0, k=K, ngram=NGRAM):
    """numpy mirror of models/generation._ngram_draft (same semantics)."""
    L = len(hist)
    idx = np.arange(L)
    match = hist == token0
    for o in range(1, ngram):
        match &= np.roll(hist, o) == hist[max(m - o, 0)]
    match &= (idx >= ngram - 1) & (idx < m)
    j = match.nonzero()[0]
    j = int(j[-1]) if len(j) else -1
    if j < 0:
        return np.full((k,), -1, np.int64)
    start = min(max(j + 1, 0), L - k)
    return hist[start:start + k]


def simulate(prompt_ids, target_ids, policy="always", probe=4, min_acc=0.8,
             reprobe=48, window=32):
    """Replay the engine's spec loop over the exact continuation
    ``target_ids``; returns (rounds, plain_steps, accepted, emitted).

    policy:
      always   — speculate every round (r3 shipping behavior w/o gate)
      oneway   — lifetime gate, off forever once below bar (first adaptive
                 design; sticky-off, misses late-onset echo)
      reprobe  — windowed gate with periodic re-probing: counters reset
                 every ``window`` rounds while on (decision tracks RECENT
                 acceptance); when gated off, fall back to plain for
                 ``reprobe`` steps, then probe again.  Worst-case overhead
                 per cycle = probe rounds amid reprobe plain steps.
    """
    p, t = len(prompt_ids), len(target_ids)
    hist = np.full((p + t,), -1, np.int64)
    hist[:p] = prompt_ids
    n = rounds = plain = accepted = 0
    rounds_w = acc_w = cooldown = 0
    spec_on = True
    while n < t:
        if policy == "oneway" and rounds >= probe:
            spec_on = accepted >= min_acc * rounds
        elif policy == "reprobe":
            if spec_on and rounds_w >= probe and acc_w < min_acc * rounds_w:
                spec_on, cooldown = False, reprobe
                rounds_w = acc_w = 0
            elif spec_on and rounds_w >= window:
                rounds_w = acc_w = 0          # track recent rate only
            elif not spec_on and cooldown <= 0:
                spec_on = True
                rounds_w = acc_w = 0
        if not spec_on:
            hist[p + n] = target_ids[n]
            n += 1
            plain += 1
            cooldown -= 1
            continue
        token0 = target_ids[n]
        drafts = ngram_draft(hist, p + n, token0)
        v = np.concatenate([[token0], drafts])
        a = 0
        while (a < K and n + 1 + a < t and drafts[a] == target_ids[n + 1 + a]
               and v[a] != EOS):
            a += 1
        e = a + 1
        hist[p + n:p + n + e] = target_ids[n:n + e]
        n += e
        rounds += 1
        accepted += a
        rounds_w += 1
        acc_w += a
    return rounds, plain, accepted, n


def throughput(rounds, plain, emitted):
    secs = rounds / SPEC_ROUNDS + plain / PLAIN_TOKS
    return emitted / secs if secs else 0.0


# ---- workload transcripts -------------------------------------------------

def w_grounding():
    prompt = ("[INST] <img>" + "<img_placeholder>" * 8 + "</img> "
              "Detect and locate every object in the image: the woman in a "
              "red coat, the brown dog, the park bench, the bicycle, the "
              "street lamp, the trash can. Use box coordinates. [/INST]")
    objs = [("woman in a red coat", (23, 41, 88, 170)),
            ("brown dog", (101, 130, 152, 180)),
            ("park bench", (60, 120, 140, 160)),
            ("bicycle", (155, 100, 210, 165)),
            ("street lamp", (8, 4, 26, 150)),
            ("trash can", (180, 140, 205, 178))]
    reply = " ".join(
        f"The {name} is located at <box_start><loc-{x}><loc-{y}><loc-{w}>"
        f"<loc-{h}><box_end>." for name, (x, y, w, h) in objs)
    return prompt, reply


def w_doc_qa():
    passage = ("The quarterly report states that revenue grew 14 percent "
               "year over year, driven primarily by subscription renewals "
               "in the enterprise segment, while operating margin expanded "
               "to 23 percent on lower infrastructure costs. Management "
               "expects subscription renewals in the enterprise segment to "
               "remain the primary growth driver through the next fiscal "
               "year, with operating margin stable near 23 percent.")
    prompt = f"[INST] {passage}\nWhat does management expect? [/INST]"
    reply = ("According to the report, management expects subscription "
             "renewals in the enterprise segment to remain the primary "
             "growth driver through the next fiscal year, with operating "
             "margin stable near 23 percent. The report also states that "
             "revenue grew 14 percent year over year, driven primarily by "
             "subscription renewals in the enterprise segment.")
    return prompt, reply


def w_chat_echo():
    prompt = ("[INST] How do I install the package? [/INST] To install the "
              "package, run pip install seedx and then verify the install "
              "with python -c 'import seedx'. [INST] And how do I install "
              "the package on a clean machine with no pip? [/INST]")
    reply = ("On a clean machine with no pip, first install pip with "
             "python -m ensurepip, and then install the package the same "
             "way: run pip install seedx and then verify the install with "
             "python -c 'import seedx'.")
    return prompt, reply


def w_story():
    prompt = "[INST] Write a short story about a lighthouse keeper. [/INST]"
    reply = ("The lighthouse keeper climbed the spiral stairs each evening "
             "as the gulls wheeled over the grey water. He trimmed the wick, "
             "polished the brass, and watched the fog roll in from the "
             "north. Some nights the fog swallowed the beam whole; other "
             "nights the beam cut clean to the horizon. He kept the light "
             "because his father had kept the light, and because the ships "
             "kept coming.")
    return prompt, reply


def w_adversarial():
    rng = np.random.default_rng(7)
    words = ["zq%d" % i for i in rng.permutation(120)]
    prompt = "[INST] List codes. [/INST]"
    reply = " ".join(words)
    return prompt, reply


def main():
    tok = ByteFallbackTokenizer()
    rows = []
    for name, builder in [("grounding", w_grounding), ("doc_qa", w_doc_qa),
                          ("chat_echo", w_chat_echo), ("story", w_story),
                          ("adversarial", w_adversarial)]:
        prompt, reply = builder()
        p_ids = np.asarray([tok.bos_token_id] + tok.encode(prompt), np.int64)
        t_ids = np.asarray(tok.encode(reply), np.int64)
        row = {"workload": name, "prompt_toks": len(p_ids),
               "reply_toks": len(t_ids)}
        for policy, mode in [("spec_always", "always"),
                             ("spec_oneway", "oneway"),
                             ("spec_reprobe", "reprobe")]:
            rounds, plain, acc, emitted = simulate(p_ids, t_ids, policy=mode)
            row[policy] = {
                "rounds": rounds, "plain_steps": plain,
                "accept_per_round": round(acc / rounds, 3) if rounds else 0,
                "tok_s": round(throughput(rounds, plain, emitted), 1),
            }
        row["plain_tok_s"] = PLAIN_TOKS
        rows.append(row)
        print(json.dumps(row))
    wins = [r["workload"] for r in rows
            if r["spec_reprobe"]["tok_s"] > PLAIN_TOKS]
    print(json.dumps({"summary": "adaptive beats plain on", "workloads": wins}))


if __name__ == "__main__":
    main()
