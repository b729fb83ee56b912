#!/bin/bash
# Probe single-thread CPU calibration every 8 min; when two consecutive
# probes are < 0.30 s (the calm-window grade of the round-5 official
# record), run the full official bench once and stop.  Writes
# bench_r5f.json + a probe log.
cd /root/repo
LOG=/tmp/calm_watch.log
: > "$LOG"
streak=0
for i in $(seq 1 40); do
  c=$(python -c "import sys; sys.path.insert(0,'/root/repo'); from bench import cpu_calibration; print(cpu_calibration())" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe $i calib=$c streak=$streak" >> "$LOG"
  ok=$(python -c "print(1 if float('$c' or 9) < 0.30 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then streak=$((streak+1)); else streak=0; fi
  if [ "$streak" -ge 2 ]; then
    echo "$(date +%H:%M:%S) CALM — running bench" >> "$LOG"
    timeout 1800 python bench.py > /tmp/bench_calm.out 2>/tmp/bench_calm.err
    tail -1 /tmp/bench_calm.out > bench_r5f.json
    echo "$(date +%H:%M:%S) bench done exit=$?" >> "$LOG"
    exit 0
  fi
  sleep 480
done
echo "no calm window found in $((40*8)) min" >> "$LOG"
exit 1
