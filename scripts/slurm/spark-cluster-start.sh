#!/usr/bin/env bash
# Submit a Spark standalone cluster as one SLURM job
# (parity: reference src/scripts/spark-utils/slurm/kslurm-spark-start.sh).
#
#   spark-cluster-start.sh [--nodes N] [--cores C] [--ram GB]
#                          [--time HH:MM:SS] [--track PATH]
#                          [--port P] [--webui-port P]
#
# Writes "<track>.jobid" (for spark-cluster-stop.sh) and — once the
# master is live — "<track>.master-url" for clients:
#
#   export SPARK_MASTER=$(cat knetminer-spark.master-url)
#   spark-submit --master "$SPARK_MASTER" your_job.py
# or, through the engine's session factory:
#   python -c 'from knetminer_etl_spark.runtime import session_from_config
#              from knetminer_etl_spark.core.config import load_config
#              spark = session_from_config(load_config("scripts/cluster-config.yaml"))'

set -euo pipefail

here="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

nodes=3
time_limit="02:00:00"
export KSPARK_WORKER_CORES="${KSPARK_WORKER_CORES:-4}"
export KSPARK_WORKER_GB="${KSPARK_WORKER_GB:-4}"
export KSPARK_TRACK="${KSPARK_TRACK:-knetminer-spark}"
export KSPARK_PORT="${KSPARK_PORT:-7077}"
export KSPARK_WEBUI_PORT="${KSPARK_WEBUI_PORT:-8080}"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --nodes)       nodes="$2"; shift 2 ;;
    --cores)       export KSPARK_WORKER_CORES="$2"; shift 2 ;;
    --ram)         export KSPARK_WORKER_GB="$2"; shift 2 ;;
    --time)        time_limit="$2"; shift 2 ;;
    --track)       export KSPARK_TRACK="$2"; shift 2 ;;
    --port)        export KSPARK_PORT="$2"; shift 2 ;;
    --webui-port)  export KSPARK_WEBUI_PORT="$2"; shift 2 ;;
    -h|--help)
      grep '^#' "$0" | sed 's/^# \{0,1\}//'; exit 0 ;;
    *) echo "unknown option: $1" >&2; exit 1 ;;
  esac
done

job_id=$(sbatch --parsable \
  --nodes="$nodes" \
  --cpus-per-task="$KSPARK_WORKER_CORES" \
  --mem="${KSPARK_WORKER_GB}G" \
  --time="$time_limit" \
  "$here/spark-cluster.sbatch")

echo "$job_id" > "${KSPARK_TRACK}.jobid"
echo "submitted SLURM job $job_id ($nodes nodes; 1 master + $((nodes - 1)) workers)"
echo "master URL appears at ${KSPARK_TRACK}.master-url once the job starts"
