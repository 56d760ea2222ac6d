#!/usr/bin/env python
"""Single source of perf truth: render every performance table in README.md
and PARITY.md from the canonical benchmark JSONs.

    python tools/perf_table.py          # print the tables
    python tools/perf_table.py --write  # splice them into README.md/PARITY.md
                                        # between the perf:{name} markers

No throughput number should ever be hand-typed into a doc: the docs carry
``<!-- perf:NAME -->`` / ``<!-- perf:end -->`` marker pairs and --write
replaces everything between them.  Canonical inputs (newest round wins):

    results_round3*.json            all-family chained sweep + AR single
    new_families_round3.jsonl       beyond-parity train rows
    new_families_round4*.jsonl      round-4 additions (consistency)
    dit_round3c_fix.jsonl           DiT width ladder
    dit_round4*.jsonl               round-4 DiT rows (if present)
    sampling_round4.jsonl + sampling_round5*.jsonl   sampler zoo (batch 64;
                                    round-5 rows overwrite round-4 ones)
    consistency_sampling_round{4,5}*.jsonl  consistency batch ladder
    ar_sampling_round3.jsonl + ar_sampling_round5*.jsonl  AR samplers
    new_families_round5*.jsonl      round-5 re-measures (latent_ddpm, ...)
    ../BENCH_r0*.json               driver headline (latest)
"""
from __future__ import annotations

import argparse
import glob
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BENCH = REPO / "benchmarks"


def load_rows(path: Path) -> dict:
    if not path.exists():
        return {}
    data = json.loads(path.read_text())
    return {r["family"]: r for r in data["rows"] if "error" not in r}


def load_jsonl(*paths) -> list:
    out = []
    for pat in paths:
        for p in sorted(glob.glob(str(pat))):
            for line in Path(p).read_text().splitlines():
                line = line.strip()
                if line.startswith("{"):
                    out.append(json.loads(line))
    return out


def latest_headline() -> dict:
    """Newest flagship headline: the driver's BENCH_r0N.json runs, plus any
    newer in-round bench.py capture (benchmarks/bench_headline_round*.json,
    jsonl of bench.py output lines — the UNet flagship is the
    ddpm_cifar10_train_imgs_per_sec row)."""
    best = {}
    for p in sorted(REPO.glob("BENCH_r0*.json")):
        try:
            d = json.loads(p.read_text())
        except Exception:
            continue
        if d.get("rc") == 0 and d.get("parsed"):
            best = d["parsed"]
            best["_src"] = p.name
    for p in sorted(BENCH.glob("bench_headline_round*.json")):
        rnd = re.search(r"round(\d+)", p.name)
        src_rnd = re.search(r"r0*(\d+)", best.get("_src", "r0"))
        if rnd and src_rnd and int(rnd.group(1)) <= int(src_rnd.group(1)):
            continue  # the driver capture for that round is authoritative
        for line in p.read_text().splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if d.get("metric") == "ddpm_cifar10_train_imgs_per_sec" and \
                    d.get("value"):
                best = d
                best["_src"] = p.name
    return best


# ------------------------------------------------------------------ sections

def family_table() -> str:
    chained = load_rows(BENCH / "results_round4.json") \
        or load_rows(BENCH / "results_round3.json")
    single = load_rows(BENCH / "results_round4_ar_single.json") \
        or load_rows(BENCH / "results_round3_ar_single.json")
    lines = [
        "| family | batch | steps/s (K=8 chained) | imgs/s | "
        "single-dispatch steps/s | GFLOPs/step | TF/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for fam, row in chained.items():
        sg = single.get(fam, {})
        sg_txt = (f"{sg['steps_per_sec']:.0f}" if sg else "—")
        lines.append(
            f"| {fam} | {row['batch']} | {row['steps_per_sec']:.0f} "
            f"| {row['imgs_per_sec']:,.0f} "
            f"| {sg_txt} "
            f"| {row.get('flops_per_step_g', 0):.1f} "
            f"| {row.get('achieved_tflops', 0):.1f} |")
    return "\n".join(lines)


NEW_FAMILY_LABELS = {
    "ddpm_cond": "ddpm cond_mnist (CFG)",
    "latent_ddpm": "latent_ddpm cifar10",
    "flow_matching": "flow_matching cifar10",
    "realnvp": "realnvp cifar10",
    "edm": "edm cifar10 (Karras preconditioning)",
    "edm_dit": "edm cifar10_dit (DiT-384 backbone)",
    "consistency": "consistency cifar10 (iCT, 1-2-step sampling)",
    "score_sde": "score_sde cifar10 (VE, PC reverse-SDE sampler)",
}


def new_families_table() -> str:
    rows = {}
    for r in load_jsonl(BENCH / "new_families_round3.jsonl",
                        BENCH / "edm_round3.jsonl",
                        BENCH / "new_families_round4*.jsonl",
                        BENCH / "new_families_round5*.jsonl"):
        if "family" in r and "error" not in r:
            rows[r["family"]] = r  # later files overwrite earlier
    lines = ["| family | steps/s | imgs/s | GFLOPs/step | TF/s |",
             "|---|---|---|---|---|"]
    for fam, r in rows.items():
        label = NEW_FAMILY_LABELS.get(fam, fam)
        lines.append(f"| {label} | {r['steps_per_sec']:.0f} "
                     f"| {r['imgs_per_sec']:,.0f} "
                     f"| {r.get('flops_per_step_g', 0):.1f} "
                     f"| {r.get('achieved_tflops', 0):.1f} |")
    return "\n".join(lines)


def dit_table() -> str:
    rows = {}
    for r in load_jsonl(BENCH / "dit_round3c_fix.jsonl",
                        BENCH / "dit_round4*.jsonl",
                        BENCH / "dit_moe_round4.jsonl",
                        BENCH / "dit_round5*.jsonl"):
        if "family" in r and "error" not in r:
            rows[r["family"]] = r
    lines = ["| backbone | GFLOPs/step | steps/s | TF/s | MFU |",
             "|---|---|---|---|---|"]
    best = max((r.get("mfu", 0) for r in rows.values()), default=0)
    for fam, r in rows.items():
        if fam == "dit_256x8":
            continue  # below the ladder's interesting range
        mfu = r.get("mfu", 0)
        mfu_txt = f"**{mfu:.3f}**" if mfu == best else f"{mfu:.3f}"
        name = fam.replace("dit_", "DiT ")
        lines.append(f"| {name} | {r['flops_per_step_g']:,.0f} "
                     f"| {r['steps_per_sec']:.1f} "
                     f"| {r['achieved_tflops']:.1f} | {mfu_txt} |")
    return "\n".join(lines)


def _metric_map(rows: list) -> dict:
    out = {}
    for r in rows:
        out[r["metric"]] = r  # later rows overwrite
    return out


def sampling_table() -> str:
    zoo = _metric_map(load_jsonl(BENCH / "sampling_round4.jsonl",
                                 BENCH / "sampling_round5*.jsonl"))
    ar = _metric_map(load_jsonl(BENCH / "ar_sampling_round3.jsonl",
                                BENCH / "ar_sampling_round5*.jsonl"))
    cm = load_jsonl(BENCH / "consistency_sampling_round4.jsonl",
                    BENCH / "consistency_sampling_round5*.jsonl")
    head = latest_headline()

    def v(m, src=None):
        r = (src or zoo).get(m)
        return r["value"] if r else None

    cm_best = {}
    for r in cm:  # best fenced throughput per nfe across the batch ladder
        k = r.get("nfe")
        if k and (k not in cm_best or r["value"] > cm_best[k]["value"]):
            cm_best[k] = r

    rows = []
    if head:
        rows.append((
            f"DDPM b={head.get('batch', 256)} train step (bf16)",
            f"**{head['value']/1000:.1f}k imgs/s** headline (`bench.py`, "
            f"K={head.get('chain', '?')} chained), "
            f"{100*head.get('mfu', 0):.1f}% MFU "
            f"(arch ceiling ~41%, `docs/MFU.md`)"))
    pairs = [
        ("ddpm_cifar10_samples_per_sec",
         "DDPM 1000-step ancestral sampling (one `lax.scan`)"),
        ("ddpm_cifar10_ddim50_samples_per_sec",
         "DDPM DDIM-50 sampling (beyond-parity fast sampler)"),
        ("ddpm_cifar10_dpm20_samples_per_sec",
         "DDPM DPM-Solver++(2M)-20 sampling"),
        ("edm_cifar10_heun18_samples_per_sec",
         "EDM Heun-18 sampling (Karras grid, 35 evals)"),
        ("flow_cifar10_heun50_samples_per_sec",
         "Flow matching Heun-50 ODE sampling (same-size UNet)"),
        ("realnvp_cifar10_samples_per_sec",
         "RealNVP sampling (one inverse conv stack, no chain)"),
        ("score_sde_cifar10_pc64_samples_per_sec",
         "Score-SDE Predictor-Corrector 64 sampling (reverse SDE, 128 evals)"),
        ("score_sde_cifar10_ode64_samples_per_sec",
         "Score-SDE probability-flow ODE Heun-64 sampling (127 evals)"),
        ("score_sde_vp_cifar10_pc64_samples_per_sec",
         "Score-SDE VP Predictor-Corrector 64 sampling (128 evals)"),
        ("ddpm_distill8_samples_per_sec",
         "Distilled student 8-step DDIM sampling (progressive distillation)"),
        ("ddpm_distill4_samples_per_sec",
         "Distilled student 4-step DDIM sampling"),
    ]
    for metric, label in pairs:
        val = v(metric)
        if val is not None:
            rows.append((label, f"{val:,.0f} samples/s"))
    for k in sorted(cm_best):
        r = cm_best[k]
        rows.append((
            f"Consistency {k}-step sampling ({k} UNet eval{'s' if k > 1 else ''})",
            f"**{r['value']:,.0f} samples/s** at batch {r['batch']} "
            f"(dispatch-bound {v('consistency_cifar10_%dstep_samples_per_sec' % k):,.0f}"
            f" at batch 64)" if v(
                f"consistency_cifar10_{k}step_samples_per_sec") else
            f"**{r['value']:,.0f} samples/s** at batch {r['batch']}"))
    ar_pairs = [
        ("pixelcnn_mnist_samples_per_sec",
         "PixelCNN 28x28 sampling (row-causal fast sampler)"),
        ("made_mnist_samples_per_sec",
         "MADE 784-dim sampling (one 784-step `lax.scan`)"),
        ("tar_mnist_samples_per_sec",
         "TAR 785-token sampling (KV-cached decode scan)"),
    ]
    for metric, label in ar_pairs:
        val = v(metric, ar)
        if val is not None:
            rows.append((label, f"{val:,.1f} samples/s"))
    lines = ["| What | Throughput |", "|---|---|"]
    lines += [f"| {a} | {b} |" for a, b in rows]
    return "\n".join(lines)


def headline_summary() -> str:
    head = latest_headline()
    if not head:
        return ""
    return (f"| DDPM CIFAR-10 train step (batch {head.get('batch', 256)}, "
            f"bf16 convs+norm traffic) | **{head['value']/1000:.1f}k imgs/s** "
            f"({100*head.get('mfu', 0):.1f}% MFU; architectural ceiling ~41%, "
            f"docs/MFU.md) ≈ {head.get('vs_baseline', 0):.0f}x the est. "
            f"reference V100 fp32 throughput (~"
            f"{head.get('baseline_imgs_per_sec', 180):.0f} imgs/s "
            f"DERIVED estimate, benchmarks/BASELINE_DERIVATION.md) |\n"
            f"| DDPM ancestral / DDIM-50 / DPM-20 sampling | see the "
            f"sampling table in README.md (generated from the newest "
            f"benchmarks/sampling_round*.jsonl) |")


SECTIONS = {
    "families": family_table,
    "new-families": new_families_table,
    "dit": dit_table,
    "sampling": sampling_table,
    "parity-headline": headline_summary,
}


def splice(path: Path, name: str, body: str) -> bool:
    text = path.read_text()
    pat = re.compile(r"(<!-- perf:%s -->\n).*?(<!-- perf:end -->)" % name,
                     re.S)
    if not pat.search(text):
        return False
    path.write_text(pat.sub(lambda m: m.group(1) + body + "\n" + m.group(2),
                            text))
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="splice tables into README.md / PARITY.md")
    args = ap.parse_args()

    for name, fn in SECTIONS.items():
        body = fn()
        if args.write:
            hits = [p.name for p in (REPO / "README.md", REPO / "PARITY.md")
                    if splice(p, name, body)]
            print(f"[{name}] -> {', '.join(hits) or 'NO MARKERS FOUND'}")
        else:
            print(f"\n### {name}\n{body}")


if __name__ == "__main__":
    main()
