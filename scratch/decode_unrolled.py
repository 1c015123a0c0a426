import bench
v = bench.bench_decode_13b(quantization="int4", scan_layers=False)
print("UNROLLED int4 B=1:", round(v, 1), "tok/s", flush=True)
