#!/bin/bash
# Submit N cooperating hypertune workers (reference demo/scripts/LoopSubmit.sh
# pattern): each job runs hypertune_params.n_trials trials against the SAME
# sqlite study, so N jobs x n_trials gives one N-times-larger search.
# From the demo/ root:
#   bash scripts/LoopSubmit.sh          # 5 workers
#   bash scripts/LoopSubmit.sh -n 12    # 12 workers

SUBDIR="./scripts"
N=5
script="slurm_run_ptyrad_tpu.sub"

while getopts n: flag; do
  case "${flag}" in
    n) N=${OPTARG} ;;
  esac
done

for i in $(seq 1 "$N"); do
  echo "Submitting $SUBDIR/$script with jobid $i"
  export JOBID=$i
  sbatch "$SUBDIR/$script"
  if [ "$i" -eq 1 ]; then
    # let worker 1 create the study/database before the others race on it
    # (the storage layer itself is safe under concurrent writers — WAL +
    # busy-timeout, tests/test_hypertune_viz.py — this just avoids N-1
    # first-contact retries)
    sleep 60
  else
    sleep 10
  fi
done

echo "Jobs are all submitted!"
