"""BERT fine-tuning trainer.

Parity with reference model_training/train_text_model.py: bert-base init,
AdamW 2e-5 weight-decay 0.01 with 10% linear warmup (:194-200), grad clip
1.0 (:91), batch 16, 5 epochs, 85/15 stratified split, best-val-accuracy
checkpoint saved in servable form (:217-223).

TPU-first: one jitted train step over static (B, 128) shapes; the encoder
can be tensor-parallel over the mesh 'model' axis via
mec_tpu.parallel.partition (Megatron column/row splits; GSPMD inserts the
ICI collectives).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mec_tpu.config import Config
from mec_tpu.convert import store
from mec_tpu.models.bert import BertForSequenceClassification
from mec_tpu.parallel.mesh import make_mesh
from mec_tpu.parallel.partition import shard_variables
from mec_tpu.text.wordpiece import WordPieceTokenizer
from mec_tpu.training import common, data, metrics


def make_steps(model: BertForSequenceClassification,
               moe_aux_weight: float = 0.01):
    moe = getattr(model, 'num_experts', 0) > 0

    @jax.jit
    def train_step(state: common.TrainState, batch, dropout_rng):
        def loss_fn(params):
            if moe:
                # MoE layers sow their load-balancing losses into the
                # 'losses' collection (models/moe.py)
                (logits, _cls), mut = model.apply(
                    {'params': params}, batch['ids'], batch['mask'],
                    train=True, rngs={'dropout': dropout_rng},
                    mutable=['losses'])
                aux = sum(jnp.sum(jnp.asarray(v))
                          for v in jax.tree_util.tree_leaves(
                              mut['losses']))
            else:
                logits, _cls = model.apply(
                    {'params': params}, batch['ids'], batch['mask'],
                    train=True, rngs={'dropout': dropout_rng})
                aux = 0.0
            onehot = jax.nn.one_hot(batch['label'], logits.shape[-1])
            return (common.softmax_cross_entropy(logits, onehot)
                    + moe_aux_weight * aux)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(variables, batch):
        logits, _cls = model.apply({'params': variables['params']},
                                   batch['ids'], batch['mask'])
        return logits

    return train_step, eval_step


def tokenize_corpus(tokenizer: WordPieceTokenizer, texts,
                    max_length: int = 128):
    ids, mask = tokenizer.encode_batch(list(texts), max_length=max_length)
    return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


def init_from_pretrained(model, bert_dir: str, seed: int):
    """Start from a converted pretrained BERT when available, else random
    init (the reference requires downloading bert-base-uncased; random init
    keeps the trainer runnable hermetically)."""
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(rng, dummy, dummy)
    if bert_dir and os.path.isdir(bert_dir):
        try:
            from mec_tpu.convert.hf_bert import convert_bert_dir
            pre = convert_bert_dir(bert_dir)['params']
            params = dict(variables['params'])
            for k in params:
                if k in pre and k not in ('classifier',):
                    params[k] = pre[k]
            variables = {'params': params}
            print(f'Initialized encoder from {bert_dir}')
        except Exception as e:
            print(f'Pretrained init unavailable ({e}); using random init')
    return variables


def train(csv_path: str, epochs: int = 5, batch_size: int = 16,
          learning_rate: float = 2e-5, max_length: int = 128,
          models_dir: Optional[str] = None, pretrained_dir: str = '',
          mesh_data: int = 0, mesh_model: int = 0, seed: int = 42,
          model_kwargs: Optional[dict] = None,
          tokenizer: Optional[WordPieceTokenizer] = None,
          texts=None, labels=None, verbose: bool = True,
          seq_bucket: bool = True, mesh_pipe: int = 0,
          microbatches: int = 2, seq_parallel: bool = False,
          experts: int = 0, grad_accum: int = 1, remat: bool = False):
    log = print if verbose else (lambda *_a, **_k: None)
    if seq_parallel:
        # Megatron sequence parallelism: the residual stream shards its
        # sequence dim over the tensor-parallel 'model' axis (models/
        # bert.py _seq_constrain); needs TP to mean anything. Validated
        # up front, before any data touches disk.
        if mesh_model <= 1:
            raise SystemExit('--seq-parallel requires --mesh-model > 1 '
                             '(the sequence dim shards over the tensor-'
                             'parallel axis)')
        if mesh_pipe > 1:
            raise SystemExit('--seq-parallel with --mesh-pipe is not '
                             'supported (the pipeline shard_map already '
                             'owns the model axis inside stages)')
    if experts > 0 and mesh_pipe > 1:
        raise SystemExit('--experts with --mesh-pipe is not supported '
                         '(the pipeline stage apply is dense-FFN only)')
    if texts is None:
        texts, labels = data.load_text_dataset(csv_path, fold_labels=False,
                                               verbose=verbose)
    if len(texts) == 0:
        raise SystemExit('No training data found')

    if tokenizer is None:
        vocab_src = pretrained_dir or Config.BERT_MODEL_PATH
        tokenizer = WordPieceTokenizer.from_pretrained_dir(vocab_src)
        if tokenizer is None:
            raise SystemExit(f'No vocab.txt under {vocab_src}; pass '
                             '--pretrained-dir with a BERT vocab')

    tr, va = metrics.train_test_split_stratified(len(texts), labels,
                                                 0.15, seed=42)
    ids, mask = tokenize_corpus(tokenizer, texts, max_length)
    if seq_bucket:
        # Slice the whole corpus to the smallest Config.SEQ_BUCKETS
        # bucket covering its longest sequence. The dropped columns are
        # all-padding for every sample (attention-masked to weight 0.0,
        # CLS pooling at position 0), so loss and gradients are
        # unchanged (byte-equal weights with dropout_rate=0, pinned by
        # tests/test_training.py::test_bert_trainer_seq_bucket_exact;
        # with dropout on, only the mask sampling differs — same
        # distribution). The reference pads everything to 128
        # (reference model_training/train_text_model.py:40-69) and pays
        # linear cost in the padded length for no signal.
        longest = int(mask.sum(axis=1).max()) if mask.size else 1
        # Floor of 32: the TRAINING step measured SLOWER at seq 16 than
        # 32 on the v5e (14.5-17.3 vs 12.0 ms at batch 32 bf16 — the
        # backward gemms drop below the MXU efficiency knee), while the
        # serving forward measured faster at 16. Different bucket floors
        # for the two paths, both from measurement.
        for s in sorted(set(Config.SEQ_BUCKETS)):
            if longest <= s < max_length and s >= 32:
                ids, mask = ids[:, :s], mask[:, :s]
                log(f'corpus max {longest} tokens; padded length {s} '
                    f'(exact w.r.t. the attention mask)')
                break
    train_data = {'ids': ids[tr], 'mask': mask[tr],
                  'label': np.asarray(labels)[tr]}
    val_data = {'ids': ids[va], 'mask': mask[va],
                'label': np.asarray(labels)[va]}
    log(f'Training set: {len(tr)}  validation set: {len(va)}')

    model_kwargs = dict(model_kwargs or {})
    if seq_parallel:
        model_kwargs.setdefault('seq_spec', ('data', 'model'))
    if experts > 0:
        model_kwargs.setdefault('num_experts', experts)
        if mesh_model > 1:
            # expert parallelism: the expert bank shards over 'model'
            model_kwargs.setdefault('ep_axis', 'model')
    if remat:
        # activation rematerialization (jax.checkpoint per encoder
        # layer, models/bert.py): O(1)-layers activation HBM for ~33%
        # recompute — combine with --grad-accum for large effective
        # batches at long sequence lengths
        model_kwargs.setdefault('remat', True)
        log('rematerialization: encoder layer activations recomputed '
            'in the backward pass (jax.checkpoint)')
    model = BertForSequenceClassification(**model_kwargs)
    variables = init_from_pretrained(model, pretrained_dir, seed)

    grad_accum = max(1, int(grad_accum))
    # schedules count OPTIMIZER updates (ceil-counted micro-steps incl.
    # the ragged tail, / grad_accum across the whole run — see
    # common.optimizer_total_steps)
    total_steps = common.optimizer_total_steps(len(tr), batch_size,
                                               epochs, grad_accum)
    # 10% linear warmup then linear decay to 0 (HF get_linear_schedule_with_warmup)
    warmup_steps = max(1, total_steps // 10)
    warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    decay = optax.linear_schedule(learning_rate, 0.0,
                                  max(1, total_steps - warmup_steps))
    lr = optax.join_schedules([warmup, decay], [warmup_steps])
    tx = common.adamw_with_clip(lr, weight_decay=0.01, clipnorm=1.0)
    if grad_accum > 1:
        # gradient accumulation: MultiSteps averages grads over
        # grad_accum micro-batches, then applies ONE AdamW update —
        # exactly a batch_size*grad_accum step without the activation
        # memory (the usual lever when a long-seq bf16 batch would
        # spill VMEM/HBM)
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
        log(f'gradient accumulation: {grad_accum} micro-batches of '
            f'{batch_size} per optimizer update (effective batch '
            f'{batch_size * grad_accum})')
    state = common.TrainState.create(variables, tx)

    mesh = None
    if mesh_data > 1 or mesh_model > 1 or mesh_pipe > 1:
        mesh = make_mesh(data=max(1, mesh_data), model=max(1, mesh_model),
                         pipe=max(1, mesh_pipe))
        state = state.replace(
            params=shard_variables(mesh, state.params)) \
            if mesh_model > 1 else state

    if mesh_pipe > 1:
        # GPipe over the encoder layers (parallel/pipeline.py); the
        # batch must split into dp x microbatches equal slices
        from mec_tpu.parallel.pipeline import make_pipeline_steps
        train_step, eval_step = make_pipeline_steps(
            model, mesh, num_microbatches=microbatches)
    else:
        train_step, eval_step = make_steps(model)
    import contextlib
    # seq_spec constraints name mesh axes with bare PartitionSpecs, which
    # resolve against the ambient mesh at trace time
    amb = (jax.sharding.set_mesh(mesh)
           if mesh is not None and (model.seq_spec is not None
                                    or model.ep_axis is not None)
           else contextlib.nullcontext())
    with amb:
        state, best_vars, history = common.fit(
            state, train_data, val_data, train_step, eval_step,
            epochs=epochs, batch_size=batch_size, seed=seed,
            monitor='val_acc', mesh=mesh, log_fn=log)

        padded, n = common.pad_batch(val_data, len(va))
        logits = np.asarray(eval_step(best_vars, padded))[:n]
    preds = logits.argmax(axis=-1)
    log('\n' + metrics.classification_report(val_data['label'], preds,
                                             Config.EMOTIONS))
    common.record_metrics('bert_text', max(history['val_acc']),
                          val_data['label'], preds)

    models_dir = models_dir or Config.BERT_MODEL_PATH
    os.makedirs(models_dir, exist_ok=True)
    store.save_params(os.path.join(models_dir, 'bert_model.mecp'),
                      best_vars,
                      meta={'val_acc': float(max(history['val_acc']))})
    cfg = {'vocab_size': model.vocab_size, 'hidden_size': model.hidden_size,
           'num_hidden_layers': model.num_layers,
           'num_attention_heads': model.num_heads,
           'intermediate_size': model.intermediate_size,
           'max_position_embeddings': model.max_position,
           'type_vocab_size': model.type_vocab_size,
           'num_labels': model.num_classes}
    if model.num_experts > 0:
        cfg['num_experts'] = model.num_experts
        cfg['moe_capacity_factor'] = model.moe_capacity_factor
    with open(os.path.join(models_dir, 'config.json'), 'w') as f:
        json.dump(cfg, f, indent=2)
    vocab_out = os.path.join(models_dir, 'vocab.txt')
    if not os.path.exists(vocab_out):
        # write by explicit id POSITION (line number = token id): joining
        # the sorted dict would close any id gaps in the source vocab and
        # silently renumber every later token relative to the trained
        # embedding rows
        lines = [''] * (max(tokenizer.vocab.values()) + 1)
        for tok, i in tokenizer.vocab.items():
            lines[i] = tok
        with open(vocab_out, 'w', encoding='utf-8') as f:
            f.write('\n'.join(lines))
    log(f'Saved BERT artifacts to {models_dir}')
    return best_vars, history


def main(argv=None):
    p = argparse.ArgumentParser(description='Fine-tune BERT for emotion')
    p.add_argument('--csv', required=True)
    p.add_argument('--epochs', type=int, default=5)
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--learning-rate', type=float, default=2e-5)
    p.add_argument('--max-length', type=int, default=128)
    p.add_argument('--models-dir', default=None)
    p.add_argument('--pretrained-dir', default='',
                   help='HF-format BERT dir for encoder init + vocab')
    p.add_argument('--mesh-data', type=int, default=0)
    p.add_argument('--mesh-model', type=int, default=0,
                   help='tensor-parallel axis size for the encoder')
    p.add_argument('--mesh-pipe', type=int, default=0,
                   help='pipeline-parallel stages for the encoder '
                        '(GPipe; num_layers must divide evenly; '
                        'composes with --mesh-model into a 3D '
                        'DPxTPxPP mesh)')
    p.add_argument('--microbatches', type=int, default=2,
                   help='pipeline microbatches per step (with '
                        '--mesh-pipe; batch must split evenly)')
    p.add_argument('--grad-accum', type=int, default=1,
                   help='accumulate gradients over K micro-batches '
                        'before each optimizer update (optax.MultiSteps;'
                        ' effective batch = batch-size * K)')
    p.add_argument('--remat', action='store_true',
                   help='rematerialize encoder-layer activations in the '
                        'backward pass (jax.checkpoint): O(1)-layers '
                        'activation memory for ~33%% recompute')
    p.add_argument('--experts', type=int, default=0,
                   help='Mixture-of-Experts FFN: swap every encoder '
                        'layer\'s dense FFN for N top-1-routed experts '
                        '(models/moe.py; with --mesh-model > 1 the '
                        'expert bank shards over the model axis — '
                        'expert parallelism)')
    p.add_argument('--seq-parallel', action='store_true',
                   help='Megatron sequence parallelism: shard the '
                        'residual stream\'s sequence dim over the '
                        'tensor-parallel axis (requires --mesh-model '
                        '> 1; all-reduces become all-gather + '
                        'reduce-scatter and LN/dropout run 1/TP-sized)')
    p.add_argument('--bf16', action='store_true',
                   help='bfloat16 compute (params stay float32): 3.3x '
                        'step rate on the v5e (29 vs 95 ms at batch 32)')
    p.add_argument('--no-seq-bucket', action='store_true',
                   help='pad every text to --max-length like the '
                        'reference instead of the smallest covering '
                        'bucket (bucketing is exact w.r.t. the '
                        'attention mask)')
    args = p.parse_args(argv)
    train(args.csv, args.epochs, args.batch_size, args.learning_rate,
          args.max_length, args.models_dir, args.pretrained_dir,
          args.mesh_data, args.mesh_model,
          model_kwargs={'dtype': jnp.bfloat16} if args.bf16 else None,
          seq_bucket=not args.no_seq_bucket, mesh_pipe=args.mesh_pipe,
          microbatches=args.microbatches, seq_parallel=args.seq_parallel,
          experts=args.experts, grad_accum=args.grad_accum,
          remat=args.remat)


if __name__ == '__main__':
    main()
