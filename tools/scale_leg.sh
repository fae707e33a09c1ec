#!/bin/bash
# One leg of the north-rule scaling pair (N vs 4N cores on the same input),
# with the round-3 post-mortem corrections applied:
#   - SPARK_DRIVER_MEM sizes the FORKED Spark driver heap (-J-Xmx only sized
#     the sbt launcher — the round-3 campaign accidentally ran on 8g);
#   - stage checkpoints AND durable CC cuts on DISK (/tmp), never tmpfs;
#   - shuffle local dirs split across disk + tmpfs;
#   - periodic GC keeps dead shuffle bounded;
#   - --durable-cc (no BlockManager pinning), --shuffle-hydration (no big
#     broadcast residency), --no-eval (the gold evaluation is untimed and
#     OOM'd after the measured wall in round 3).
# Usage: scale_leg.sh <cpus> <pages> <entities> <ckptdir> <logfile>
set -u
CPUS=$1; PAGES=$2; ENTS=$3; CKPT=$4; LOG=$5
cd /root/repo
echo "=== leg cpus=$CPUS pages=$PAGES start $(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG"
df -h / /dev/shm | tee -a "$LOG"
rm -rf "$CKPT" /tmp/spark-local /dev/shm/spark
mkdir -p /tmp/spark-local /dev/shm/spark
/usr/bin/time -v env \
  SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_CPUS=$CPUS \
  SPARK_GRAFT_LOCAL_DIR=/tmp/spark-local,/dev/shm/spark \
  SPARK_GRAFT_PERIODIC_GC=45s \
  sbt -batch "runMain graft.Main $CKPT $PAGES $ENTS --no-resume --durable-cc --shuffle-hydration --no-eval" \
  >> "$LOG" 2>&1
RC=$?
echo "=== leg cpus=$CPUS rc=$RC end $(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG"
df -h / /dev/shm | tee -a "$LOG"
exit $RC
