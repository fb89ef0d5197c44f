"""Measure the reference PyTorch-CPU training throughput (the bench baseline).

Runs the upstream 2G-GCN (mounted at /root/reference) on the same synthetic
MPHOI-shaped workload bench.py uses, and reports clips/sec for a full
training step (forward + backward + Adam). The resulting number is recorded
in BASELINE.md and hard-coded in bench.py as REFERENCE_CPU_CLIPS_PER_SEC.

Usage: python tools/bench_reference.py [--steps 3] [--batch 8] [--time-steps 167]
"""

import argparse
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/root/reference")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=1)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--time-steps", type=int, default=167)
    parser.add_argument("--hidden", type=int, default=512)
    parser.add_argument("--threads", type=int, default=0)
    args = parser.parse_args()
    sys.path.insert(0, args.reference)

    import torch
    import torch.nn.functional as F
    from vhoi.models import TGGCN

    if args.threads:
        torch.set_num_threads(args.threads)
    torch.manual_seed(0)
    b, t, num_humans, num_objects = args.batch, args.time_steps, 2, 4
    model = TGGCN(input_size=(2152, 2048), num_classes=(13, None),
                  hidden_size=args.hidden, gcn_node=26,
                  message_humans_to_human=True, message_human_to_objects=True,
                  message_objects_to_human=True, message_objects_to_object=True,
                  message_geometry_to_objects=True, message_segment=True,
                  message_type="v2", message_granularity="v1",
                  message_aggregation="att", attention_style="v3",
                  discrete_optimization_strategy="gs",
                  object_segment_update_strategy="ind")
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-4)

    rng = np.random.default_rng(0)
    x_human = torch.from_numpy(rng.normal(size=(b, t, num_humans, 2152)).astype(np.float32))
    x_objects = torch.from_numpy(rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32))
    mask = torch.ones(b, num_objects)
    steps = torch.full((b,), float(t))
    seg = torch.ones(b, t, num_humans)
    y_rec = torch.from_numpy(rng.integers(0, 13, size=(b, t, num_humans)))

    def train_step():
        optimizer.zero_grad()
        outputs = model(x_human, x_objects, mask, human_segmentation=seg,
                        steps_per_example=steps)
        # Main losses: segment-level recognition/prediction NLL, like stage 1.
        loss = (F.nll_loss(outputs[4], y_rec, ignore_index=-1) +
                F.nll_loss(outputs[5], y_rec, ignore_index=-1))
        loss.backward()
        optimizer.step()
        return float(loss)

    for _ in range(args.warmup):
        train_step()
    start = time.perf_counter()
    for _ in range(args.steps):
        train_step()
    elapsed = time.perf_counter() - start
    steps_per_sec = args.steps / elapsed
    clips_per_sec = steps_per_sec * b
    print(f"threads={torch.get_num_threads()} steps/sec={steps_per_sec:.4f} "
          f"clips/sec={clips_per_sec:.4f} (B={b}, T={t}, hidden={args.hidden})")


if __name__ == "__main__":
    main()
