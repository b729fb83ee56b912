#!/bin/bash
# Calm-window watcher for the layout-v7 sf0.8 scaling reps (round 5 final
# code).  Probes single-thread CPU calibration every 5 min; when two
# consecutive probes are < 0.30 s (the calm-window grade of the r5
# official record), runs scaling_more_reps.py (2 paired 2->8-core reps on
# the pre-generated /tmp/horus_scaling_sf0.8 corpus) with a load sidecar,
# then stops.  Sentinel /tmp/scaling_running marks the measurement window
# so interactive work can hold off.
cd /root/repo
LOG=/root/repo/scaling_sf08_r5s2.log
PROBELOG=/tmp/calm_scaling_probes.log
: > "$PROBELOG"
streak=0
for i in $(seq 1 60); do
  c=$(python -c "import sys; sys.path.insert(0,'/root/repo'); from bench import cpu_calibration; print(cpu_calibration())" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe $i calib=$c streak=$streak" >> "$PROBELOG"
  ok=$(python -c "print(1 if float('$c' or 9) < 0.30 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then streak=$((streak+1)); else streak=0; fi
  if [ "$streak" -ge 2 ]; then
    echo "$(date +%H:%M:%S) CALM (calib=$c) — running v7 scaling reps" >> "$PROBELOG"
    touch /tmp/scaling_running
    ( while [ -f /tmp/scaling_running ]; do
        echo "$(date +%H:%M:%S) $(cat /proc/loadavg)" >> /root/repo/loadavg_r5s2.log
        sleep 30
      done ) &
    SIDECAR=$!
    SCALING_REPS=2 timeout 5400 python scaling_more_reps.py > "$LOG" 2>&1
    rc=$?
    rm -f /tmp/scaling_running
    wait $SIDECAR 2>/dev/null
    c2=$(python -c "import sys; sys.path.insert(0,'/root/repo'); from bench import cpu_calibration; print(cpu_calibration())" 2>/dev/null)
    echo "end_calib=$c2 rc=$rc" >> "$LOG"
    echo "$(date +%H:%M:%S) scaling done rc=$rc end_calib=$c2" >> "$PROBELOG"
    exit $rc
  fi
  sleep 300
done
echo "no calm window found" >> "$PROBELOG"
exit 1
