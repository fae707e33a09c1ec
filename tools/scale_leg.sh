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
# Usage: scale_leg.sh <cpus> <pages> <entities> <ckptdir> <logfile> [extra-args]
set -u
CPUS=$1; PAGES=$2; ENTS=$3; CKPT=$4; LOG=$5; EXTRA=${6:-}
cd /root/repo
echo "=== leg cpus=$CPUS pages=$PAGES start $(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG"
df -h / /dev/shm | tee -a "$LOG"
rm -rf "$CKPT" /tmp/spark-local /dev/shm/spark /dev/shm/spark1 /dev/shm/spark2
mkdir -p /tmp/spark-local /dev/shm/spark1 /dev/shm/spark2
# local dirs 2:1 tmpfs:disk — at 9.6M pages the live s4 shuffle peaked ~92G
# under --shuffle-hydration; a 1:1 split plus the ~20G s4 parquet write
# overflowed the 74G disk TWICE (measured, this round). Two fixes: 2/3 of
# shuffle on tmpfs, and hydration by BROADCAST (the mentions projection is
# ~1.1GB at 9.6M — the byte-auto picks broadcast; the round-3 advice to
# force shuffle hydration dates from the accidental 8g driver heap), which
# removes the two 260M-row join shuffles entirely.
env \
  SPARK_DRIVER_MEM=40g \
  SPARK_GRAFT_CPUS=$CPUS \
  SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark1,/dev/shm/spark2,/tmp/spark-local \
  SPARK_GRAFT_PERIODIC_GC=45s \
  sbt -batch "runMain graft.Main $CKPT $PAGES $ENTS --no-resume --durable-cc --no-eval $EXTRA" \
  >> "$LOG" 2>&1
RC=$?
echo "=== leg cpus=$CPUS rc=$RC end $(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG"
df -h / /dev/shm | tee -a "$LOG"
exit $RC
