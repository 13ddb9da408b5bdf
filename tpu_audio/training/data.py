"""Fine-tuning data pipeline: (audio, transcript) pairs → static-shape
batches for training/whisper.make_train_step.

TPU-first constraints drive the design: every batch has IDENTICAL shapes
(mel fixed at the model's 30 s window, token tensors padded to a fixed
``max_tokens`` with a loss mask), so one compiled train step serves the
whole run — no rebucketing recompiles. Host-side work (mel, tokenization,
shuffling) is NumPy; `shard` places a batch over a (dp, tp) mesh with rows
on dp, matching parallel.shardings' megatron param layout.

The reference is inference-only (SURVEY §5.4) — this subsystem has no
reference counterpart; its shape conventions follow the Whisper training
recipe (30 s windows, teacher forcing on the shifted token stream).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from tpu_audio.models.whisper.config import WhisperConfig

SAMPLE_RATE = 16000


@dataclass
class Example:
    """One training utterance, already featurized to static shapes."""
    mel: np.ndarray        # (2*n_audio_ctx, n_mels) f32
    tokens: np.ndarray     # (<= max_tokens+1,) int32 incl. SOT..EOT


def featurize(audio: np.ndarray, sample_rate: int, text: str, tokenizer,
              cfg: WhisperConfig, language: str = "en",
              task: str = "transcribe") -> Example:
    """Raw audio + transcript → Example (host-side, NumPy in/out).

    Audio is padded/trimmed to the model's 30 s window; the token stream is
    [sot, lang, task] + text + [eot] (the same special-token prefix the
    inference decoder conditions on)."""
    import jax.numpy as jnp

    from tpu_audio.ops import frontends
    from tpu_audio.ops.resample import resample

    if sample_rate != SAMPLE_RATE:
        audio = resample(audio, sample_rate, SAMPLE_RATE)
    want = 2 * cfg.n_audio_ctx * 160  # hop 160, mel drops the last frame
    if len(audio) < want:
        audio = np.pad(audio.astype(np.float32), (0, want - len(audio)))
    else:
        audio = audio[:want].astype(np.float32)
    mel = np.asarray(frontends.whisper_log_mel(jnp.asarray(audio),
                                               n_mels=cfg.n_mels))
    sot_seq = list(tokenizer.sot_sequence(language=language, task=task))
    toks = sot_seq + list(tokenizer.encode(" " + text.strip())) + [
        tokenizer.eot]
    return Example(mel=mel, tokens=np.asarray(toks, np.int32))


@dataclass
class Batcher:
    """Static-shape batches with shuffling; drops examples whose token
    stream exceeds max_tokens (loudly, once)."""
    examples: Sequence[Example]
    batch_size: int
    max_tokens: int = 128
    seed: int = 0

    def __post_init__(self):
        dropped = [i for i, e in enumerate(self.examples)
                   if len(e.tokens) > self.max_tokens + 1]
        if dropped:
            from tpu_audio.utils import get_logger

            get_logger("training").warning(
                "Batcher: dropping %d/%d examples longer than max_tokens=%d",
                len(dropped), len(self.examples), self.max_tokens)
        self._pool = [e for e in self.examples
                      if len(e.tokens) <= self.max_tokens + 1]
        if not self._pool:
            raise ValueError("no examples fit max_tokens")

    def batches(self, epochs: int | None = None) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(self._pool))
            for start in range(0, len(order) - self.batch_size + 1,
                               self.batch_size):
                idx = order[start:start + self.batch_size]
                yield self._collate([self._pool[i] for i in idx])
            epoch += 1

    def _collate(self, batch: list[Example]) -> dict:
        b, t = len(batch), self.max_tokens
        mel = np.stack([e.mel for e in batch])
        tin = np.zeros((b, t), np.int32)
        tout = np.zeros((b, t), np.int32)
        mask = np.zeros((b, t), np.float32)
        for i, e in enumerate(batch):
            n = len(e.tokens) - 1
            tin[i, :n] = e.tokens[:-1]
            tout[i, :n] = e.tokens[1:]
            mask[i, :n] = 1.0
        return {"mel": mel.astype(np.float32), "tokens_in": tin,
                "tokens_out": tout, "mask": mask}


def shard(batch: dict, mesh) -> dict:
    """Place a host batch on a (dp, tp) mesh: rows sharded over dp."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(v):
        spec = P("dp", *([None] * (v.ndim - 1)))
        return jax.device_put(v, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items()}


def evaluate(params, cfg: WhisperConfig, batches: Iterator[dict],
             max_batches: int = 8) -> dict:
    """Teacher-forced eval: mean loss + next-token accuracy over the mask."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.models.whisper import model as wmodel

    @jax.jit
    def _eval(params, mel, tin, tout, mask):
        feats = wmodel.encode(params, cfg, mel)
        logits, _ = wmodel.forward_cross_qk(params, cfg, tin, feats)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, tout[..., None], axis=-1)[..., 0]
        hits = (jnp.argmax(logits, -1) == tout).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mask), 1)
        return jnp.sum(nll * mask) / denom, jnp.sum(hits * mask) / denom

    losses, accs = [], []
    for i, b in enumerate(batches):
        if i >= max_batches:
            break
        loss, acc = _eval(params, b["mel"], b["tokens_in"],
                          b["tokens_out"], b["mask"])
        losses.append(float(loss))
        accs.append(float(acc))
    return {"loss": float(np.mean(losses)), "token_acc": float(np.mean(accs)),
            "batches": len(losses)}


def train(params, cfg: WhisperConfig, batcher: Batcher, steps: int,
          optimizer=None, mesh=None, eval_every: int = 0,
          log_every: int = 10) -> tuple[dict, list[float]]:
    """Minimal training loop around training.whisper.make_train_step.

    mesh: optional (dp, tp) Mesh — params are sharded with whisper_rules
    and batches over dp (the dryrun's train check runs exactly this path).
    Returns (trained params, per-step losses)."""
    import jax

    from tpu_audio.training.whisper import make_train_step
    from tpu_audio.utils import get_logger

    log = get_logger("training")
    if mesh is not None:
        from tpu_audio.parallel import param_shardings, whisper_rules

        pshard = param_shardings(params, mesh, whisper_rules)
        params = jax.tree_util.tree_map(jax.device_put, params, pshard)
    init_opt, train_step = make_train_step(cfg, optimizer)
    opt_state = init_opt(params)
    step_fn = jax.jit(train_step, donate_argnums=(0, 1))

    losses: list[float] = []
    it = batcher.batches(epochs=None)
    for step in range(steps):
        batch = next(it)
        if mesh is not None:
            batch = shard(batch, mesh)
        params, opt_state, loss = step_fn(params, opt_state, batch)
        losses.append(float(loss))
        if log_every and step % log_every == 0:
            log.info("step %d loss %.4f", step, losses[-1])
        if eval_every and step and step % eval_every == 0:
            m = evaluate(params, cfg, batcher.batches(epochs=1))
            log.info("eval @%d: loss %.4f acc %.3f", step, m["loss"],
                     m["token_acc"])
    return params, losses
