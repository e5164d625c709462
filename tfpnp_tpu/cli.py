"""Unified CLI — the four near-clone reference ``tasks/*/main.py`` entry
points collapsed into one (their shared flow: parse Options -> build
policy/denoiser/solver -> wrap for multi-device -> Evaluator or Trainer;
e.g. /root/reference/tasks/csmri/main.py:70-97).

Usage:
  python -m tfpnp_tpu --task csmri --solver admm [--eval -r CKPT] ...
"""

from __future__ import annotations

import importlib
from pathlib import Path

import jax

from .eval.evaluator import Evaluator
from .models.actor import actor_spec_for
from .parallel.mesh import batch_sharder, make_mesh
from .pnp.denoiser import load_denoiser
from .pnp.tv import TVDenoiser
from .rl.trainer import MDDPGTrainer, TrainConfig
from .utils.log import Logger
from .utils.options import Options


def main(argv=None):
    opt = Options().parse(argv)
    from .parallel.distributed import init_distributed
    init_distributed()  # no-op unless TFPNP_COORDINATOR/… are set
    logger = Logger(opt.output, enable_tensorboard=opt.tensorboard)
    logger.log(f"devices: {jax.devices()}")

    if opt.denoiser == "tv":
        denoiser = TVDenoiser()
    else:
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if opt.precision == "bf16" else jnp.float32
        denoiser = load_denoiser(opt.denoiser_ckpt, compute_dtype=dtype)

    task = importlib.import_module(f"tfpnp_tpu.tasks.{opt.task}")
    env, sample_data, eval_sets, solver_name, lr_schedule = task.build(opt, denoiser)
    logger.log(f"task={opt.task} solver={solver_name} pack={opt.action_pack} "
               f"steps={opt.max_episode_step}")

    ranges, actor = actor_spec_for(solver_name, opt.action_pack)
    mesh = make_mesh(opt.mesh_dp)
    shard = batch_sharder(mesh)
    multi = jax.process_count() > 1
    if multi:
        logger.log(f"multi-host: {jax.process_count()} processes, "
                   f"{jax.device_count()} devices (local "
                   f"{jax.local_device_count()}), mesh {dict(mesh.shape)}")
    if opt.eval_data:  # external sets REPLACE the synthetic protocol
        from .data.npz import load_data_npz
        eval_sets = {}
        for spec in opt.eval_data:
            name, _, path = spec.partition("=")
            eval_sets[name] = load_data_npz(path)
        logger.log(f"eval sets from --eval_data: {sorted(eval_sets)}")
    eval_sets = {k: shard(v) for k, v in eval_sets.items()}

    # multi-host: every process joins the (replicated) eval computation —
    # the actor variables are global arrays, so the episode program is a
    # collective — but only process 0 writes artifacts
    save_dir = (f"{opt.output}/eval_results"
                if jax.process_index() == 0 else None)
    evaluator = Evaluator(env, actor, ranges, eval_sets,
                          save_dir=save_dir, logger=logger,
                          loop_penalty=opt.loop_penalty)

    if opt.eval:
        if opt.resume:
            from .utils.checkpoint import load_state
            state = load_state(opt.resume)
            variables = {"params": state["actor_params"],
                         "batch_stats": state["actor_stats"]}
        else:  # fall back to the shipped policy for this solver name
            from . import pretrained
            variables = pretrained.load_policy(solver_name)
            logger.log(f"loaded shipped policy "
                       f"{pretrained.policy_path(solver_name).name}")
            status = pretrained.policy_status(solver_name)
            if status:  # known-suboptimal / evidenced-optimal stopping
                logger.log(f"policy status: {status}")
        variables = jax.tree.map(jax.numpy.asarray, variables)
        if multi:
            from .parallel.mesh import replicate
            variables = replicate(mesh, variables)
        from .utils.profiling import trace
        with trace(f"{opt.output}/trace", enabled=opt.profile):
            evaluator.eval(variables, step=opt.resume_step or 0)
        return

    cfg = TrainConfig(
        train_steps=opt.train_steps, env_batch=opt.env_batch,
        max_episode_step=opt.max_episode_step, action_pack=opt.action_pack,
        rmsize=opt.rmsize, warmup=opt.warmup, actor_warmup=opt.actor_warmup,
        discount=opt.discount,
        tau=opt.tau, loop_penalty=opt.loop_penalty, lambda_e=opt.lambda_e,
        episode_train_times=opt.episode_train_times,
        validate_interval=opt.validate_interval, save_freq=opt.save_freq,
        seed=opt.seed, replay_backend=opt.replay,
        ckpt_backend=opt.ckpt_backend,
        stop_grad_mode=opt.stop_grad, mc_weight=opt.mc_weight,
        advantage_norm=not opt.no_advantage_norm,
        terminal_mask=not opt.no_terminal_mask,
        keep_ckpts=opt.keep_ckpts)
    from functools import partial

    from .parallel.mesh import local_assembler, replicate
    trainer = MDDPGTrainer(cfg, env, actor, ranges, sample_data, lr_schedule,
                           evaluator=evaluator, log_dir=opt.output,
                           logger=logger, shard_batch=shard,
                           assemble_batch=local_assembler(mesh) if multi else None,
                           place_params=partial(replicate, mesh) if multi else (lambda x: x),
                           mesh=mesh)
    if opt.resume:
        trainer.load(opt.resume)
        if opt.reset_best:
            # the best.pkl selection score restarts from scratch — used
            # when the selection criterion changed (e.g. penalty-aware
            # scoring) and the stored best_eval is on the old scale
            trainer.best_eval = float("-inf")
    elif opt.reset_best:
        logger.log("WARNING: --reset_best has no effect without --resume "
                   "(best-checkpoint selection already starts fresh)")
    if opt.init_actor and not opt.resume:
        import pickle

        from . import pretrained
        spec = solver_name if opt.init_actor == "auto" else opt.init_actor
        if Path(spec).exists():  # a shipped-actor pickle file
            with open(spec, "rb") as f:
                state = pickle.load(f)
            variables = {"params": state["actor_params"],
                         "batch_stats": state["actor_stats"]}
        else:  # a registry solver name
            variables = pretrained.load_policy(spec)
        trainer.warm_start_actor(variables)
        logger.log(f"warm-started actor from {spec} "
                   f"(critic/optimizers/step fresh)")
    elif opt.init_actor:
        logger.log("WARNING: --init_actor ignored because --resume restores "
                   "the full training state")
    if opt.profile:
        from .utils.profiling import trace
        with trace(f"{opt.output}/trace"):
            trainer.train()
    else:
        trainer.train()
    trainer.save(Path(opt.output) / "ckpt" / f"final{trainer.ckpt_ext}",
                 opt.train_steps)


if __name__ == "__main__":
    main()
