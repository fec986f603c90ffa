"""Export the best probe-selected checkpoint's params to a msgpack.

    python scripts/export_best.py <config> <run_dir> <probe_jsonl> <out.msgpack>
"""
import json, sys
from pathlib import Path

# `python scripts/export_best.py` puts scripts/ (not the repo root) on
# sys.path; make the package importable regardless of invocation dir.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cfg_path, run, probe, out = sys.argv[1:5]
rows = [json.loads(l) for l in open(probe)]
rows = [r for r in rows if "mean_ir" in r]
best = max(rows, key=lambda r: r["mean_ir"])
print("best step", best["step"], "mean_ir", best["mean_ir"])

import jax
from pose6d_tpu import runtime
runtime.configure()
from pose6d_tpu.config import load_config
from pose6d_tpu.models import DPFMNet
from pose6d_tpu.cli.probe_ckpts import restore_params_from_trainstate
from pose6d_tpu.train.checkpoint import save_params
from pose6d_tpu.data.pipeline import make_sample
from pose6d_tpu.train.eval_loop import build_eval_dataset

cfg = load_config(cfg_path, [])
ds = build_eval_dataset(cfg)
cad, pc, extra = ds[0]
s = make_sample(cad, pc, extra)
model = DPFMNet(cfg.model)
template = model.init(jax.random.PRNGKey(0), s["cad"], s["pc"])
ck = Path(run) / "ckpt" / f"ckpt_{best['step']:08d}.msgpack"
params = restore_params_from_trainstate(ck, template)
save_params(out, params)
print("wrote", out)
