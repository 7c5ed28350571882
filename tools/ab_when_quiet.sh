#!/bin/bash
# Wait for a quiet box (CPU steal < threshold over consecutive 30 s
# samples), then run the interleaved headline A/B.  The first r7 attempt
# ran under ~24% steal and produced directionally-contradictory ratios —
# the isolating A/B needs the neighbor gone.
THRESH=${1:-4}      # percent steal
NEEDED=${2:-3}      # consecutive quiet samples
MAX_WAIT_MIN=${3:-90}
ok=0
for i in $(seq 1 $((MAX_WAIT_MIN * 2))); do
  read -r _ u1 n1 s1 i1 w1 irq1 sirq1 st1 _ < /proc/stat
  sleep 30
  read -r _ u2 n2 s2 i2 w2 irq2 sirq2 st2 _ < /proc/stat
  tot=$(( (u2+n2+s2+i2+w2+irq2+sirq2+st2) - (u1+n1+s1+i1+w1+irq1+sirq1+st1) ))
  st=$(( st2 - st1 ))
  pct=$(( tot > 0 ? 100 * st / tot : 0 ))
  echo "$(date +%H:%M:%S) steal=${pct}%"
  load1=$(cut -d. -f1 /proc/loadavg)
  if [ "$pct" -lt "$THRESH" ] && [ "$load1" -lt 2 ]; then
    ok=$((ok+1))
  else
    ok=0
  fi
  if [ "$ok" -ge "$NEEDED" ]; then
    echo "quiet window reached — launching A/B"
    python /root/repo/tools/ab_headline.py
    exit $?
  fi
done
echo "no quiet window within ${MAX_WAIT_MIN} min — giving up"
exit 3
