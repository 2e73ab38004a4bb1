#!/bin/bash
# Round-6 final-evidence watcher: probe the box's hardware scaling ceiling
# every ~3 min; in the first good window run bench.py at HEAD (captures the
# WMH-kernel cut, zero-shuffle signatures, CC fixpoint v2 and append
# job-count work that all landed AFTER the last recorded bench), then
# re-probe and if the window holds launch the 1->4 scaling retake.
# The probe trail is itself adjudication evidence (the failed-window
# fallback convention from rounds 4-6).
set -u
cd /root/repo
LOG=/tmp/weather_watch_r6.log
BENCH_BAR=0.84
SCALE_BAR=0.80

probe() {
    python tools/cpu_calibration.py 2>/dev/null | tail -1 |
        python3 -c "import json,sys; print(json.load(sys.stdin)['1->4']['eff'])"
}

echo "$(date -u +%H:%M:%S) watcher start (HEAD $(git rev-parse --short HEAD))" >> "$LOG"
BENCH_DONE=0
for i in $(seq 1 200); do
    EFF=$(probe)
    echo "$(date -u +%H:%M:%S) ceiling $EFF" >> "$LOG"
    GOOD=$(python3 -c "print(1 if float('$EFF') >= $BENCH_BAR else 0)")
    if [ "$GOOD" = "1" ]; then
        if [ "$BENCH_DONE" = "0" ]; then
            echo "$(date -u +%H:%M:%S) window open -> bench.py" >> "$LOG"
            python bench.py > /tmp/bench_r6_good.json 2>/tmp/bench_r6_good.err
            echo "$(date -u +%H:%M:%S) bench.py rc=$? done" >> "$LOG"
            BENCH_DONE=1
            continue
        fi
        SGOOD=$(python3 -c "print(1 if float('$EFF') >= $SCALE_BAR else 0)")
        if [ "$SGOOD" = "1" ]; then
            echo "$(date -u +%H:%M:%S) window holds -> bench_scaling" >> "$LOG"
            python tools/bench_scaling.py --rows 480000 --runs 3 --warmup 1 \
                --cores 1,4 --no-pin > /tmp/bench_scaling_r6.log 2>&1
            echo "$(date -u +%H:%M:%S) bench_scaling rc=$? done" >> "$LOG"
            break
        fi
    fi
    sleep 180
done
echo "$(date -u +%H:%M:%S) watcher exit" >> "$LOG"
