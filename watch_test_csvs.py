"""Round-5 helper: snapshot each trainer's test_SISNRi_value.csv to an
epoch-named file whenever a new inline test completes (the engine keeps
one rolling value.csv; the per-epoch evidence files are snapshots)."""
import os
import re
import shutil
import time

WATCHES = [
    ("models/synth_train_large_r5b.log", "models/SepReformer_L_synth"),
    ("models/synth_train_wham_r5.log", "models/SepReformer_WHAM_synth"),
]


def last_epoch_before(log_text, pos):
    eps = [int(m.group(1)) for m in
           re.finditer(r"INFO epoch (\d+):", log_text[:pos])]
    return eps[-1] + 1 if eps else None  # test runs inside the NEXT epoch


seen = {}
while True:
    for log_path, workdir in WATCHES:
        try:
            text = open(log_path).read()
        except OSError:
            continue
        tests = list(re.finditer(r"INFO test: .*over \d+ utterances", text))
        key = log_path
        n_prev = seen.get(key, None)
        if n_prev is None:
            seen[key] = len(tests)  # don't re-snapshot history on start
            continue
        if len(tests) > n_prev:
            m = tests[-1]
            ep = last_epoch_before(text, m.start())
            src = os.path.join(workdir, "test_SISNRi_value.csv")
            if ep is not None and os.path.exists(src):
                dst = os.path.join(workdir, f"test_SISNRi_epoch{ep}.csv")
                shutil.copyfile(src, dst)
                print(f"snapshot {dst}", flush=True)
            seen[key] = len(tests)
    time.sleep(45)
