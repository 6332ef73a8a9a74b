#!/bin/bash
# Loop bench runs until a stall (>40s with no [bench] progress line) is caught.
# On stall: sample non-sleeping threads via /proc (works even when the JVM
# can't reach a safepoint, unlike jstack), plus safepoint/GC log tails.
cd /root/repo
DIAG=/tmp/stall_diag.log
: > $DIAG
for i in $(seq 1 10); do
  echo "=== RUN $i $(date) ===" >> $DIAG
  rm -f /tmp/bench_live.log /tmp/safepoint.log /tmp/gc.log
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=16g \
  GRAFT_JAVA_OPTS="-Xlog:safepoint:file=/tmp/safepoint.log:time,uptime -Xlog:gc:file=/tmp/gc.log:time,uptime -XX:+SafepointTimeout -XX:SafepointTimeoutDelay=10000" \
    scripts/run.sh graft.Bench 2>&1 | grep --line-buffered -E "^\[bench\]|SafepointTimeout|Timed out" > /tmp/bench_live.log &
  BPID=$!
  sleep 8
  JPID=$(pgrep -f "java.*graft.Bench" | head -1)
  LAST=-1; STALL=0; CAUGHT=0
  while kill -0 $BPID 2>/dev/null; do
    sleep 10
    N=$(wc -l < /tmp/bench_live.log 2>/dev/null || echo 0)
    if [ "$N" == "$LAST" ]; then
      STALL=$((STALL+10))
      if [ "$STALL" -ge 40 ] && [ "$CAUGHT" -lt 3 ]; then
        CAUGHT=$((CAUGHT+1))
        {
          echo "--- STALL sample $CAUGHT run $i at $(date) after: $(tail -1 /tmp/bench_live.log)"
          vmstat 1 2 | tail -1
          echo "[non-sleeping threads]"
          ps -L -o tid,state,pcpu,wchan:35,comm -p $JPID 2>/dev/null | awk 'NR==1 || $2!="S"'
          for TID in $(ps -L -o tid= -o state= -p $JPID 2>/dev/null | awk '$2!="S"{print $1}' | head 5); do
            echo "[kernel stack tid=$TID name=$(cat /proc/$JPID/task/$TID/comm 2>/dev/null)]"
            cat /proc/$JPID/task/$TID/stack 2>/dev/null | head -15
          done
          echo "[top threads by cpu]"
          top -b -H -n1 -p $JPID 2>/dev/null | sed -n '7,20p'
          echo "[safepoint tail]"
          tail -5 /tmp/safepoint.log 2>/dev/null
          echo "[gc tail]"
          tail -3 /tmp/gc.log 2>/dev/null
        } >> $DIAG 2>&1
      fi
    else
      STALL=0; CAUGHT=0
    fi
    LAST=$N
  done
  wait $BPID
  TOTAL=$(grep -c '^\[bench\]' /tmp/bench_live.log)
  SLOW=$(awk '$NF=="s" && $(NF-1)>60 {print}' /tmp/bench_live.log)
  echo "run $i done: $TOTAL queries; slow: ${SLOW:-none}" >> $DIAG
  cp /tmp/bench_live.log /tmp/bench_run_$i.log
  # stop early once we have caught a stall with samples
  if grep -q "STALL sample 2" $DIAG; then echo "stall captured; stopping loop" >> $DIAG; break; fi
done
echo ALLDONE >> $DIAG
