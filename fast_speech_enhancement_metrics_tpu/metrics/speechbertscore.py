"""SpeechBERTScore (semantic similarity via mHuBERT-147 embeddings), TPU-native.

Behavioral contract (reference: fast_se_metrics/SpeechBERTScore.py:17-65,
itself following kohei0209's DiscreteSpeechMetrics fork): layer-8 hidden
states of mHuBERT-147 for clean and denoised audio; per pair, the cosine
similarity matrix's row-max mean (precision), column-max mean (recall), and
their harmonic mean (F1).

TPU design: clean+denoised ride one doubled batch through the encoder (which
runs only the 8 layers that matter — models/hubert.py); the similarity
matrices, maxes and F1 for the whole batch are one fused einsum/reduce graph
with a single (B,) device->host transfer (the reference loops pairs in Python
and syncs per pair). The encoder's matmuls can shard 2-way over a ``model``
mesh axis for tensor parallelism (see parallel/).

Weights: zero-egress TPU pods can't pull from the HF hub at runtime, so the
model loads from a converted ``.npz`` (utils/convert_hubert.py); if absent, it
falls back to ``transformers`` + hub cache, and otherwise raises with
conversion instructions.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp

from fast_speech_enhancement_metrics_tpu.base import BaseMetric
from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG,
    HubertConfig,
    hubert_hidden_state,
)

DEFAULT_CHECKPOINT = Path(__file__).parent.parent / "checkpoints" / "mhubert147.npz"


class SpeechBERTScore(BaseMetric):
    higher_is_better = True
    EXPECTED_SAMPLING_RATE = 16000

    def __init__(
        self,
        sample_rate: int = 16000,
        checkpoint: str | Path | None = None,
        params=None,
        config: HubertConfig = MHUBERT_147_CONFIG,
        output_layer: int = 8,
        precision: str | None = "default",
        batch_chunk: int | None = None,
        attention_impl: str = "auto",
        host_chunk: int | None = None,
        act_dtype=None,
        gelu: str = "auto",
        softmax: str = "auto",
        **kw,
    ):
        """``precision="default"`` = bf16 MXU passes, the TPU analogue of the
        fp16 autocast + TF32 the reference runs this model under (measured
        6e-4 F1 deviation — the reference's own published deviation class);
        ``"highest"`` = fp32-exact. ``act_dtype=jnp.bfloat16`` additionally
        stores the encoder's activation stream in bf16 (halves its HBM
        traffic — see models/hubert.py). ``attention_impl``: "einsum" (XLA),
        "flash" (Pallas kernel — wins once sequences are long enough that the
        (B,H,T,T) logits dominate HBM), or "auto". ``gelu="tanh"`` swaps the
        exact erf GELU for the tanh approximation — measured F1 shift
        2.5e-6 (tests/test_speechbertscore.py, 200x inside the reference's
        5e-4 contract and ~200x below the bf16 class already accepted at
        the default precision) for a large cut of the encoder's
        transcendental VPU time (erf measured 8.4 ms/layer slower than tanh,
        tools/prof_sbs_stages.py). ``gelu="auto"`` ties it to precision:
        tanh on the reduced-precision default path, exact erf at
        ``precision="highest"``."""
        super().__init__(sample_rate, **kw)
        self.config = config
        self.output_layer = output_layer
        self.precision = precision
        self.act_dtype = act_dtype
        assert gelu in ("auto", "erf", "tanh")
        if gelu == "auto":
            gelu = "erf" if precision == "highest" else "tanh"
        self.gelu = gelu
        #: "exp2": max-free softmax (2^x with log2e folded into the logit
        #: scale — exact up to fp32 rounding, overflow-clamped; see
        #: models/hubert.py::_attention). "auto" ties it to precision like
        #: gelu: exp2 on the reduced-precision default path, exact at
        #: "highest".
        assert softmax in ("auto", "exact", "exp2", "exp2_bf16")
        if softmax == "auto":
            softmax = "exact" if precision == "highest" else "exp2"
        self.softmax = softmax
        #: attention logits are (b, 12, T, T) — chunking the utterance axis
        #: caps peak HBM for long-audio/large-batch workloads
        self.batch_chunk = batch_chunk
        self.attention_impl = attention_impl
        #: like batch_chunk but the chunk loop runs in Python over one small
        #: jitted encoder graph (identical results; a fraction of the XLA
        #: compile cost of a fused lax.map graph). Single-device only.
        self.host_chunk = host_chunk
        if host_chunk is not None and self.mesh is not None:
            raise ValueError(
                "host_chunk is a single-device execution plan; use "
                "batch_chunk with a mesh"
            )
        self.params = params if params is not None else self._load_params(checkpoint)
        if self.mesh is not None:  # Megatron-style TP over the 'model' axis
            from fast_speech_enhancement_metrics_tpu.parallel.sharding import (
                shard_params,
            )

            self.params = shard_params(self.params, self.mesh, self.config)

    def _load_params(self, checkpoint):
        from fast_speech_enhancement_metrics_tpu.utils.convert_hubert import (
            MHUBERT_147,
            convert_pretrained,
            load_params,
        )

        path = Path(checkpoint) if checkpoint is not None else DEFAULT_CHECKPOINT
        if path.exists():
            return load_params(str(path), dtype=self.dtype)
        if checkpoint is not None:
            raise FileNotFoundError(f"HuBERT checkpoint not found: {checkpoint}")
        try:
            params, self.config = convert_pretrained(MHUBERT_147)
            return params
        except Exception as e:  # no hub cache, no network
            raise FileNotFoundError(
                f"No converted mHuBERT-147 checkpoint at {DEFAULT_CHECKPOINT} and "
                f"the HF hub is unreachable ({type(e).__name__}). On a machine "
                "with network access run: python -m fast_speech_enhancement_"
                f"metrics_tpu.utils.convert_hubert '{MHUBERT_147}' "
                f"'{DEFAULT_CHECKPOINT}'"
            ) from e

    def _resolve_impl(self, num_samples: int, rows: int) -> str:
        impl = self.attention_impl
        if impl != "auto":
            return impl
        # Measured on v5e (tools/prof_sdpa_long.py, batch 4, bf16): the
        # single-pass sdpa kernel (ops/sdpa_pallas.py) beats einsum and
        # flash once sequences are long — 64.6 vs einsum 82.6 vs flash
        # 105.6 ms at 1999 frames, 112.9/143.1/290.6 at 3999, and 252.5 vs
        # flash 965.2 at 7999 where einsum's per-layer (rows, heads, T, T)
        # logits exceed HBM; the upstream flash kernel only remains past
        # sdpa's resident-K/V VMEM range. Short utterances belong to the
        # round-5 fused block megakernels (see below).
        frames = num_samples // 320
        on_tpu = all(
            d.platform == "tpu"
            for d in (
                self.mesh.devices.flat if self.mesh is not None else [self.device]
            )
        )
        if not on_tpu:
            return "einsum"
        heads = self.config.num_attention_heads
        logits_gb = rows * heads * frames * frames * 4 / 1e9
        if frames >= 1500 or logits_gb > 4.0:
            # sdpa holds one head's full K/V in VMEM — verified on-chip to
            # 40k frames (~13 minutes of audio); past that only the
            # K-blocked flash kernel's VMEM footprint stays bounded
            return "sdpa" if frames <= 40000 else "flash"
        # Round 5: the fused block megakernels (attention block: QKV + exp2
        # softmax + AV + o-proj + residual + post-LN in one Pallas kernel;
        # FFN block: W1 + gelu + W2 + residual + post-LN in another —
        # ops/attn_block_pallas.py) measured +32% end-to-end over einsum at
        # the bench shape (5062 vs 3838 audio-s/s interleaved,
        # tools/prof_sbs_block.py) at the same F1 class (8.7e-5 dev vs
        # fp32): the qkv / (H,T,T) probability / context / FFN-hidden
        # tensors never touch HBM. Default-precision post-LN short-sequence
        # regime only — these are bf16 kernels, they fuse across the
        # residual+LN boundaries (post-LN structure), and under TP the
        # per-layer weights are sharded. (attention_impl="block_int8" is
        # the measured-NEGATIVE int8 screening mode: 4617 audio-s/s —
        # slower than the bf16 block — at 2.4e-2 F1.)
        if (
            self.precision in (None, "default")
            and self.mesh is None
            and not self.config.do_stable_layer_norm
            and self.config.num_attention_heads % 2 == 0  # head-pair slices
        ):
            return "block_ffn"
        return "einsum"

    def _f1_from_embeddings(self, clean_emb, denoised_emb):
        norm_c = clean_emb / jnp.linalg.norm(clean_emb, axis=2, keepdims=True)
        norm_d = denoised_emb / jnp.linalg.norm(denoised_emb, axis=2, keepdims=True)
        sim = jnp.einsum("btd,bsd->bts", norm_d, norm_c, precision="highest")
        precision_score = jnp.max(sim, axis=2).mean(axis=1)
        recall = jnp.max(sim, axis=1).mean(axis=1)
        f1 = 2.0 * precision_score * recall / (precision_score + recall)
        return {"SpeechBERTScore": f1}

    def _run_prepared(self, clean, denoised):
        if self.host_chunk is None:
            return super()._run_prepared(clean, denoised)
        if self.sample_rate != self.EXPECTED_SAMPLING_RATE:
            from fast_speech_enhancement_metrics_tpu.ops.resample import resample

            clean = resample(clean, self.sample_rate, self.EXPECTED_SAMPLING_RATE)
            denoised = resample(denoised, self.sample_rate, self.EXPECTED_SAMPLING_RATE)

        impl = self._resolve_impl(denoised.shape[1], self.host_chunk)
        # cache the jitted encoder per resolved attention impl — a later call
        # whose length crosses the auto threshold must not reuse a stale impl
        if not hasattr(self, "_encode_jitted_by_impl"):
            import jax

            self._encode_jitted_by_impl = {}
            self._f1_jitted = jax.jit(self._f1_from_embeddings)
        if impl not in self._encode_jitted_by_impl:
            import jax

            self._encode_jitted_by_impl[impl] = jax.jit(
                lambda a, impl=impl: hubert_hidden_state(
                    self.params,
                    a,
                    self.config,
                    output_layer=self.output_layer,
                    precision=self.precision,
                    attention_impl=impl,
                    act_dtype=self.act_dtype,
                    gelu=self.gelu,
                    softmax=self.softmax,
                    fused_qkv=self.mesh is None,
                )
            )
        encode_jitted = self._encode_jitted_by_impl[impl]

        speech = jnp.concatenate([clean, denoised], axis=0)
        n, chunk = speech.shape[0], self.host_chunk
        pad = (-n) % chunk
        if pad:  # tile rows so any chunk > 2n still pads to a chunk multiple
            reps = -(-pad // n)
            speech = jnp.concatenate([speech] + [speech] * reps, axis=0)[: n + pad]
        emb = jnp.concatenate(
            [
                encode_jitted(speech[i : i + chunk])
                for i in range(0, speech.shape[0], chunk)
            ],
            axis=0,
        )[:n]
        batch = n // 2
        return self._f1_jitted(emb[:batch], emb[batch:])

    def _compute(self, clean, denoised):
        assert clean is not None
        batch = clean.shape[0]

        speech = jnp.concatenate([clean, denoised], axis=0)
        rows = speech.shape[0]
        chunk = self.batch_chunk
        if chunk is None:
            # auto-chunk: the conv feature extractor's first activation is
            # (rows, T/5, 512) — at batch 128 x 16 s that alone is ~13 GB
            # and the fused graph exceeds HBM. The bench shape (rows 128,
            # ~6.7 GB) runs fused and must NOT chunk (a mis-set 6 GB
            # threshold here cost a 1.7x bench regression: the padded
            # lax.map computed 224 of 128 rows). Past ~8 GB, split into the
            # FEWEST equal row chunks that fit (identical scores;
            # chunking-exactness asserted in tests/test_speechbertscore.py).
            bytes_per = 2 if self.act_dtype is not None else 4
            fe_gb = rows * (speech.shape[1] // 5) * 512 * bytes_per / 1e9
            if fe_gb > 8.0:
                n_chunks = int(-(-fe_gb // 8.0))
                per_chunk = -(-rows // n_chunks)
                chunk = max(8, -(-per_chunk // 8) * 8)
        if chunk is not None:
            rows = min(rows, chunk)
        impl = self._resolve_impl(speech.shape[1], rows)

        def encode(audio):
            return hubert_hidden_state(
                self.params,
                audio,
                self.config,
                output_layer=self.output_layer,
                precision=self.precision,
                attention_impl=impl,
                act_dtype=self.act_dtype,
                gelu=self.gelu,
                softmax=self.softmax,
                # TP shards q/k/v column-wise over 'model'; the fused concat
                # would cut across shard boundaries (see models/hubert.py)
                fused_qkv=self.mesh is None,
            )

        if chunk is not None and speech.shape[0] > chunk:
            import jax

            n = speech.shape[0]
            pad = (-n) % chunk
            if pad:
                speech = jnp.concatenate([speech, speech[:pad]], axis=0)
            emb = jax.lax.map(
                encode, speech.reshape(-1, chunk, speech.shape[1])
            )
            emb = emb.reshape(-1, emb.shape[2], emb.shape[3])[:n]
        else:
            emb = encode(speech)
        return self._f1_from_embeddings(emb[:batch], emb[batch:])
