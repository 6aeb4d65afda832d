"""Seed-sweep harness for seed-sensitive object discovery
(reference README.md:79-81 warns convergence depends on the seed, worst on
3bp_color; the reference offers no tooling for this — new capability,
SURVEY.md §7 hard part (c)).

Trains the same config across N parameter seeds (short runs) and reports
per-seed eval losses so a good seed can be picked before a long run:

    python tools/seed_sweep.py --task spring_color --epochs 50 \
        --seeds 0 1 2 3 --data_dir data/datasets --batch_size 100 \
        --base_lr 6e-4 --autoencoder_loss 3.0
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3])
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--base_lr", type=float, default=6e-4)
    p.add_argument("--autoencoder_loss", type=float, default=3.0)
    p.add_argument("--optimizer", default="rmsprop")
    p.add_argument("--attn_overlap_loss", type=float, default=0.0)
    p.add_argument("--recons_warmup", action="store_true")
    p.add_argument("--aux_warmup_epochs", type=int, default=0)
    p.add_argument("--data_dir", default="data/datasets")
    p.add_argument("--out", default="seed_sweep.json")
    p.add_argument("--save_root", default="/tmp/paig_seed_sweep")
    args = p.parse_args(argv)

    from paig_reproduction_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from paig_reproduction_tpu.cli import TASK_TABLE
    from paig_reproduction_tpu.data.iterators import get_iterators
    from paig_reproduction_tpu.models.registry import get_model
    from paig_reproduction_tpu.train.trainer import Trainer

    (data_file, _, cell_type, seq_len, _, input_steps, pred_steps,
     input_size) = TASK_TABLE[args.task]

    import numpy as np

    results = {}
    for seed in args.seeds:
        np.random.seed(seed)   # data-shuffle determinism (matches cli.py)
        model = get_model("PhysicsNet")(
            task=args.task, cell_type=cell_type, seq_len=seq_len,
            input_steps=input_steps, pred_steps=pred_steps,
            autoencoder_loss=args.autoencoder_loss, color=True,
            input_size=input_size,
            attn_overlap_loss=args.attn_overlap_loss,
            recons_warmup=args.recons_warmup)
        its = get_iterators(os.path.join(args.data_dir, data_file),
                            conv=True)
        trainer = Trainer(model, seed=seed)
        trainer.get_data(its)
        trainer.init_params(its[0].X[:1])
        spe = max(1, its[0].num_examples // args.batch_size)
        trainer.build_optimizer(args.base_lr, args.optimizer, True,
                                epochs=args.epochs, steps_per_epoch=spe,
                                aux_warmup_epochs=args.aux_warmup_epochs)
        save_dir = os.path.join(args.save_root,
                                f"{args.task}_seed{seed}")
        trainer.initialize_graph(save_dir, False)
        metrics = trainer.train_model(
            args.epochs, args.batch_size, save_every_n_epochs=args.epochs,
            eval_every_n_epochs=max(1, args.epochs // 2),
            print_interval=100, debug=True)
        results[seed] = {k: float(v) for k, v in metrics.items()}
        print(f"seed {seed}: {results[seed]}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    best = min(results, key=lambda s: results[s]["eval_pred_loss"])
    print(f"best seed: {best} -> {results[best]}")


if __name__ == "__main__":
    main()
