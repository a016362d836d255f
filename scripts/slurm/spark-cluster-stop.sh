#!/usr/bin/env bash
# Stop a cluster started by spark-cluster-start.sh: cancel the SLURM job
# via the tracked job id; the sbatch's EXIT trap tears down workers then
# the master and removes the master-url file
# (parity: reference src/scripts/spark-utils/slurm/kslurm-spark-stop.sh).

set -euo pipefail

track="${KSPARK_TRACK:-knetminer-spark}"
while [[ $# -gt 0 ]]; do
  case "$1" in
    --track) track="$2"; shift 2 ;;
    -h|--help) grep '^#' "$0" | sed 's/^# \{0,1\}//'; exit 0 ;;
    *) echo "unknown option: $1" >&2; exit 1 ;;
  esac
done

jobid_file="${track}.jobid"
[[ -f "$jobid_file" ]] || { echo "no job id file at $jobid_file" >&2; exit 1; }
job_id=$(<"$jobid_file")
[[ -n "$job_id" ]] || { echo "$jobid_file is empty" >&2; exit 1; }

# SIGINT reaches the batch script, whose trap runs the ordered shutdown
scancel --batch --signal INT "$job_id"
rm -f "$jobid_file"
echo "stop requested for SLURM job $job_id"
