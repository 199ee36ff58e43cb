#!/usr/bin/env python
"""Sharded DUFO-label job generator (reference assets/slurm/dufolabel_sbatch.py).

Emits one shell command per shard over the scene range; pipe to xargs/parallel
on a CPU host or submit each line to your scheduler.

    python assets/cluster/dufolabel_jobs.py --num_shards 16 \
        --data_dir /data/av2/preprocess/sensor/train | parallel -j 16
"""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--num_shards", type=int, default=16)
    args = p.parse_args()
    for shard in range(args.num_shards):
        print(f"python process.py --data_dir {args.data_dir} "
              f"--scene_range {shard},-1 --interval {args.num_shards}")


if __name__ == "__main__":
    main()
