import gzip, json, collections, re, glob
paths = sorted(glob.glob("/tmp/clipa_bench_trace/plugins/profile/*/vm.trace.json.gz"))
ev = json.load(gzip.open(paths[-1]))["traceEvents"]
dev_pids = set()
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pname = (e.get("args") or {}).get("name", "")
        if re.search(r"TPU|/device:|Device", pname, re.I):
            dev_pids.add(e["pid"])
durs = collections.defaultdict(float); cnt = collections.Counter(); info = {}
cats = collections.Counter()
for e in ev:
    if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in dev_pids:
        continue
    a = e.get("args") or {}
    cats[a.get("hlo_category", "<none>")] += 1
    name = e["name"]
    if not name.split(".")[0] == "fusion":
        continue
    durs[name] += e["dur"] / 1e3; cnt[name] += 1; info[name] = a
print("categories:", dict(cats.most_common(8)))
print(f"total 'fusion.*' ms: {sum(durs.values()):.1f}")
for name, ms in sorted(durs.items(), key=lambda kv: -kv[1])[:12]:
    a = info[name]
    fl = float(a.get("flops", 0) or 0); by = float(a.get("bytes_accessed", 0) or 0)
    n = cnt[name]
    tfs = fl * n / (ms / 1e3) / 1e12 if fl else 0
    gbs = by * n / (ms / 1e3) / 1e9 if by else 0
    keys = [k for k in a if k not in ("flops","bytes_accessed","hlo_category")]
    ln = str(a.get("long_name", a.get("expression", keys)))[:200]
    print(f"{ms:8.2f} ms x{n:3d} {tfs:6.1f}TF/s {gbs:6.0f}GB/s  {name[:28]}  {ln}")
