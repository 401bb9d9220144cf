#!/bin/bash
# Interleaved A/B: r3 (.ab_r3 worktree) vs HEAD (repo root), two rounds each.
set -u
cd /root/repo
for round in 1 2; do
  for leg in r3 head; do
    if [ "$leg" = r3 ]; then dir=/root/repo/.ab_r3; else dir=/root/repo; fi
    echo "=== round $round leg $leg $(date +%T) ===" >> /root/repo/.ab_out/log.txt
    (cd "$dir" && timeout 900 python bench.py > /root/repo/.ab_out/${leg}_${round}.json 2> /root/repo/.ab_out/${leg}_${round}.err)
    echo "exit=$? $(date +%T)" >> /root/repo/.ab_out/log.txt
  done
done
echo DONE >> /root/repo/.ab_out/log.txt
