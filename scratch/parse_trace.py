import gzip, json, sys, re, collections
import glob
path = glob.glob(sys.argv[1] + "/plugins/profile/*/*.trace.json.gz")
print(path)
ev = []
for p in path:
    d = json.load(gzip.open(p))
    ev += [e for e in d.get("traceEvents", []) if e.get("ph") == "X"]
agg = collections.Counter()
cnt = collections.Counter()
for e in ev:
    name = re.sub(r"[\d.]+", "#", e.get("name", ""))
    agg[name] += e.get("dur", 0)
    cnt[name] += 1
total = sum(agg.values())
print(f"total {total/1e6:.2f} s over {len(ev)} events")
for name, us in agg.most_common(25):
    print(f"{us/1e3:9.1f} ms  x{cnt[name]:6d}  {name[:100]}")
