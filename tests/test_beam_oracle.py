"""Beam search correctness: a slow full-recompute Python beam oracle (exact
HF-style scoring over gpt2_apply) must match both beam implementations, and
split-cache must equal dense exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.models.gpt import get_conditioning, gpt2_apply, init_unified_voice
from indextts_tpu.models.gpt_decode import (
    GenerationConfig,
    _generate_speech_beam_dense,
    _mel_logits,
    generate_speech_beam,
    prepare_gpt_inputs,
)
from indextts_tpu.ops.sampling import apply_repetition_penalty
from tests.test_gpt import tiny_cfg

NEG = float(np.finfo(np.float32).min)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_unified_voice(jax.random.PRNGKey(0), cfg)
    rng_np = np.random.default_rng(11)
    mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
    conds = get_conditioning(params, cfg, mel, jnp.asarray([40]))
    return cfg, params, conds


def oracle_beam(params, cfg, conds, text, lens, nb, max_new, length_penalty=0.0, rep_pen=1.0):
    """Deterministic beam search by full recomputation, mirroring the jitted
    drivers' semantics (2*nb candidates, best finished tracked, early stop)."""
    emb0, mask0 = prepare_gpt_inputs(params, cfg, conds, text, lens)
    stop = cfg.stop_mel_token
    v = cfg.number_mel_codes

    p_len = emb0.shape[1]

    def logits_for(seq):
        """HF beam order (transformers-4.36 beam_search): LOG-SOFTMAX first,
        THEN the repetition-penalty processor on log-probs (always <= 0, so
        the penalty always multiplies — the drivers share this exact order
        via gpt_decode._beam_joint_scores)."""
        embs = [emb0]
        if seq:
            toks = jnp.asarray(np.asarray(seq, np.int32)[None, :])
            pos = jnp.asarray([t + 2 for t in range(len(seq))])
            embs.append(params["mel_embedding"][toks] + params["mel_pos_embedding"][pos][None])
        e = jnp.concatenate(embs, axis=1)
        m = jnp.concatenate([mask0, jnp.ones((1, len(seq)), bool)], axis=1)
        hidden = gpt2_apply(params["gpt"], e, cfg.heads, attention_mask=m)
        lg = np.asarray(_mel_logits(params, hidden[:, -1]).astype(jnp.float32))[0]
        seen = np.zeros(v, bool)
        seen[1] = True
        seen[cfg.start_mel_token] = True
        seen[np.asarray(seq, np.int64)] = True
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(lg)))
        if rep_pen != 1.0:
            logp = np.asarray(
                apply_repetition_penalty(jnp.asarray(logp[None]), jnp.asarray(seen[None]), rep_pen)
            )[0]
        return logp

    beams = [([], 0.0)] + [([], NEG)] * (nb - 1)
    best = (NEG, None)
    for step in range(max_new):
        cand = []
        for bi, (seq, score) in enumerate(beams):
            logp = logits_for(seq) if score > NEG / 2 else np.full(v, NEG)
            joint = score + logp if score > NEG / 2 else np.full(v, NEG)
            for tok in np.argsort(-joint)[: 2 * nb]:
                cand.append((joint[tok], bi, int(tok)))
        cand.sort(key=lambda x: -x[0])
        cand = cand[: 2 * nb]
        # HF BeamHypotheses.add base: FULL hypothesis length incl. the
        # prompt, excluding the eos being scored (prefill + step)
        lp = (p_len + step) ** length_penalty
        cont = []
        for rank, (score, bi, tok) in enumerate(cand):
            if tok == stop:
                # HF rank filter: only top-nb-ranked eos candidates finish
                if rank < nb and score / lp > best[0]:
                    best = (score / lp, beams[bi][0] + [tok])
            else:
                cont.append((beams[bi][0] + [tok], score))
        cont = cont[:nb]
        while len(cont) < nb:
            cont.append(([], NEG))
        beams = cont
        # early stop: best live can't beat best finished (admissible base:
        # longest finish helps when lp > 0, the NEXT step when lp <= 0)
        live_best = max(s for _, s in beams)
        opt_base = (p_len + max_new) if length_penalty > 0 else (p_len + step + 1)
        if best[1] is not None and live_best / (opt_base**length_penalty) <= best[0]:
            break
    # HF finalize: live beams join the pool, normalized by the FULL length
    live_seq, live_score = max(beams, key=lambda x: x[1])
    if best[1] is None or live_score / ((p_len + max_new) ** length_penalty) > best[0]:
        return live_seq, len(live_seq)
    return best[1], len(best[1])


class TestHFProcessorOrdering:
    def test_rep_penalty_applies_to_log_probs(self):
        """HF beam_search order: log_softmax FIRST, then the repetition
        penalty on log-probs (<= 0, always multiplied). The raw-logits order
        (divide a positive logit) ranks tokens differently — pin the HF one."""
        import jax.nn

        from indextts_tpu.models.gpt_decode import GenerationConfig, _beam_joint_scores

        gen = GenerationConfig(do_sample=False, num_beams=2, max_new_tokens=4)
        logits = jnp.asarray([[4.0, 3.0, 0.0, -1.0]])
        seen = jnp.asarray([[True, False, False, False]])
        beam_scores = jnp.asarray([0.0], jnp.float32)
        out = np.asarray(_beam_joint_scores(
            logits, seen, beam_scores, gen, jnp.float32(1.0), jnp.float32(1.0),
            jnp.float32(10.0), jnp.float32(0.9)))
        lf = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32)))
        # seen token: log-prob multiplied by the penalty (HF), NOT the raw
        # logit divided by it
        np.testing.assert_allclose(out[0, 0], lf[0, 0] * 10.0, rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], lf[0, 1], rtol=1e-6)
        # under the multiply rule the seen top token falls below the runner-up
        # (raw-logit division would have kept it on top: 4/10=0.4 vs 3.0 -> ranked
        # by 0.4 - logsumexp, still above a 10x-multiplied log-prob ordering flip)
        assert out[0, 0] < out[0, 1]

    def test_beam_sample_warpers_on_joint_scores(self):
        """beam_sample: temperature/top-p run AFTER beam scores are added
        (HF warps the joint scores — a dead beam's NEG_INF row must never
        out-rank a live beam after warping)."""
        from indextts_tpu.models.gpt_decode import GenerationConfig, _beam_joint_scores

        gen = GenerationConfig(do_sample=True, num_beams=2, top_k=0, max_new_tokens=4)
        logits = jnp.asarray([[1.0, 0.5, 0.0, -0.5], [9.0, 0.0, 0.0, 0.0]])
        seen = jnp.zeros((2, 4), bool)
        beam_scores = jnp.asarray([0.0, -1e30], jnp.float32)  # beam 1 dead
        out = np.asarray(_beam_joint_scores(
            logits, seen, beam_scores, gen, jnp.float32(0.7), jnp.float32(0.8),
            jnp.float32(1.0), jnp.float32(0.9)))
        assert out[1].max() < out[0].min()  # dead beam stays dead post-warp
        assert (out[0] > -1e29).sum() >= 2  # min_tokens_to_keep=2 for beams


class TestBeamFinalize:
    def test_live_beam_beats_finished_hypothesis(self):
        """HF finalize: a live beam whose full-length-normalized score beats
        the best finished hypothesis WINS (the pre-fix code always returned
        the finished one)."""
        from indextts_tpu.models.gpt_decode import _beam_finalize

        b, nb, max_new, p = 1, 2, 4, 10
        codes = jnp.asarray([[7, 8, 9, 9], [5, 5, 5, 5]], jnp.int32)  # [bb, max_new]
        beam_scores = jnp.asarray([-3.0, -20.0], jnp.float32)
        done_best = (jnp.asarray([-50.0], jnp.float32),          # finished, worse
                     jnp.asarray([[1, 2, 3, 4]], jnp.int32),
                     jnp.asarray([2], jnp.int32))
        fc, fl = _beam_finalize(codes, beam_scores, done_best, b, nb, max_new, 0.0, p)
        np.testing.assert_array_equal(np.asarray(fc)[0], [7, 8, 9, 9])
        assert int(fl[0]) == max_new

    def test_finished_still_wins_when_better(self):
        from indextts_tpu.models.gpt_decode import _beam_finalize

        b, nb, max_new, p = 1, 2, 4, 10
        codes = jnp.asarray([[7, 8, 9, 9], [5, 5, 5, 5]], jnp.int32)
        beam_scores = jnp.asarray([-30.0, -40.0], jnp.float32)
        done_best = (jnp.asarray([-5.0], jnp.float32),
                     jnp.asarray([[1, 2, 3, 4]], jnp.int32),
                     jnp.asarray([2], jnp.int32))
        fc, fl = _beam_finalize(codes, beam_scores, done_best, b, nb, max_new, 0.0, p)
        np.testing.assert_array_equal(np.asarray(fc)[0], [1, 2, 3, 4])
        assert int(fl[0]) == 2


class TestBeamOracle:
    @pytest.mark.parametrize("nb", [2, 3])
    def test_dense_matches_oracle(self, setup, nb):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        gen = GenerationConfig(do_sample=False, num_beams=nb, max_new_tokens=10)
        codes, length = _generate_speech_beam_dense(
            params, cfg, gen, conds, text, lens, jax.random.PRNGKey(0), repetition_penalty=1.0
        )
        gold_seq, gold_len = oracle_beam(params, cfg, conds, text, lens, nb, 10)
        got = list(np.asarray(codes[0, : int(length[0])]))
        # oracle records the eos in the sequence; driver pads codes with stop
        if gold_len and gold_seq[-1] == cfg.stop_mel_token:
            assert got[: gold_len] == gold_seq, (got, gold_seq)
        else:
            assert got[: gold_len] == gold_seq[:gold_len], (got, gold_seq)

    def test_split_matches_dense_greedy(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        for nb in (2, 3):
            gen = GenerationConfig(do_sample=False, num_beams=nb, max_new_tokens=12)
            a, la = _generate_speech_beam_dense(
                params, cfg, gen, conds, text, lens, jax.random.PRNGKey(0), repetition_penalty=10.0
            )
            bcodes, lb = generate_speech_beam(
                params, cfg, gen, conds, text, lens, jax.random.PRNGKey(0), repetition_penalty=10.0
            )
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bcodes))
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_split_matches_dense_sampled(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        gen = GenerationConfig(do_sample=True, num_beams=3, top_k=30, max_new_tokens=10)
        a, _ = _generate_speech_beam_dense(
            params, cfg, gen, conds, text, lens, jax.random.PRNGKey(4)
        )
        bcodes, _ = generate_speech_beam(
            params, cfg, gen, conds, text, lens, jax.random.PRNGKey(4)
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bcodes))

    def test_split_matches_dense_with_prefix(self, setup):
        """Forced mel-code prefixes (ref model.py:690-703): split-cache and
        dense drivers must agree token-for-token, greedy and sampled."""
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        prefix = jnp.asarray([[3, 4, 7]], jnp.int32)
        for do_sample in (False, True):
            gen = GenerationConfig(do_sample=do_sample, num_beams=2,
                                   top_k=30, max_new_tokens=10)
            a, la = _generate_speech_beam_dense(
                params, cfg, gen, conds, text, lens, jax.random.PRNGKey(3),
                repetition_penalty=2.0, input_tokens=prefix,
            )
            bcodes, lb = generate_speech_beam(
                params, cfg, gen, conds, text, lens, jax.random.PRNGKey(3),
                repetition_penalty=2.0, input_tokens=prefix,
            )
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bcodes))
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_prefix_first_token_matches_greedy(self, setup):
        """Absolute anchor for the beam prefix prefill: at max_new=1 with
        deterministic decode, the best beam's single token is the argmax of
        the post-prefix logits — exactly greedy's first token, whose prefix
        prefill is oracled against full recompute in test_gpt.py."""
        from indextts_tpu.models.gpt_decode import generate_speech

        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        prefix = jnp.asarray([[3, 4, 7]], jnp.int32)
        gen_b = GenerationConfig(do_sample=False, num_beams=2, max_new_tokens=1)
        bc, _ = generate_speech_beam(
            params, cfg, gen_b, conds, text, lens, jax.random.PRNGKey(0),
            repetition_penalty=1.0, input_tokens=prefix,
        )
        gen_g = GenerationConfig(do_sample=False, num_beams=1, max_new_tokens=1)
        gc, _ = generate_speech(
            params, cfg, gen_g, conds, text, lens, jax.random.PRNGKey(0),
            repetition_penalty=1.0, input_tokens=prefix,
        )
        assert int(bc[0, 0]) == int(gc[0, 0])

    def test_split_batched(self, setup):
        cfg, params, conds = setup
        texts = jnp.asarray([[5, 6, 7, 8, 9, 1], [10, 11, 12, 1, 1, 1]], jnp.int32)
        lens = jnp.asarray([5, 3])
        conds2 = jnp.concatenate([conds, conds], axis=0)
        gen = GenerationConfig(do_sample=False, num_beams=2, max_new_tokens=8)
        a, la = _generate_speech_beam_dense(
            params, cfg, gen, conds2, texts, lens, jax.random.PRNGKey(0), repetition_penalty=1.0
        )
        bcodes, lb = generate_speech_beam(
            params, cfg, gen, conds2, texts, lens, jax.random.PRNGKey(0), repetition_penalty=1.0
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bcodes))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
