import gzip, json, collections, re, glob
paths = sorted(glob.glob("/tmp/clipa_bench_trace/plugins/profile/*/vm.trace.json.gz"))
ev = json.load(gzip.open(paths[-1]))["traceEvents"]
dev_pids = set()
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        if re.search(r"TPU|/device:|Device", (e.get("args") or {}).get("name",""), re.I):
            dev_pids.add(e["pid"])
groups = collections.defaultdict(lambda: [0.0, 0])
example = {}
for e in ev:
    if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in dev_pids:
        continue
    name = e["name"]
    if name.split(".")[0] != "fusion":
        continue
    a = e.get("args") or {}
    ln = str(a.get("long_name", ""))
    sig = ln.split(" fusion(")[0].split(" = ")[-1][:90]
    groups[sig][0] += e["dur"]/1e3; groups[sig][1] += 1
    example[sig] = ln
for sig, (ms, n) in sorted(groups.items(), key=lambda kv: -kv[1][0])[:8]:
    print(f"{ms:8.2f} ms x{n:3d}  {sig}")
# full text of the biggest
big = max(groups.items(), key=lambda kv: kv[1][0])[0]
print("\nFULL:", example[big][:1200])
