import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tilemaker_spark.session import get_spark
from tilemaker_spark.config import EngineConfig, LayerConfig
from tilemaker_spark.operators.tile_assembly import assemble_tiles
from tilemaker_spark.operators.tiling import ancestor_rollup, cover_clip_explode, cover_explode

spark = get_spark("hierbench")
spark.sparkContext.setLogLevel("ERROR")

rows = []
rng = np.random.default_rng(1)
for i in range(30):
    cx, cy = rng.uniform(-30, 30), rng.uniform(10, 40)
    ang = np.linspace(0, 2*np.pi, 5000, endpoint=False)
    r = 3.0 * (1 + 0.3*np.sin(7*ang) + 0.1*np.sin(23*ang))
    ring = np.column_stack([cx + r*np.cos(ang), cy + r*np.sin(ang)]).reshape(-1).tolist()
    rows.append((i, "polys", 3, 0, 0, {}, [ring]))
feats = spark.createDataFrame(rows, "feature_id long, layer string, geom_type int, min_zoom int, z_order int, attrs map<string,string>, geom array<array<double>>").cache()
feats.count()

cfg = EngineConfig(basezoom=11, minzoom=0, maxzoom=11, compress="none", hot_tile_salt=0)
cfg.layers["polys"] = LayerConfig(name="polys", minzoom=0, maxzoom=14)

t0=time.time()
flat = cover_explode(feats, 11)
flat = ancestor_rollup(flat, 0, 11)
nf = assemble_tiles(flat, cfg).count()
t_flat = time.time()-t0
print(f"flat  tiles={nf} sec={t_flat:.1f}", flush=True)

t0=time.time()
hier = cover_clip_explode(feats, 0, 11)
nh = assemble_tiles(hier, cfg).count()
t_hier = time.time()-t0
print(f"hier  tiles={nh} sec={t_hier:.1f} speedup={t_flat/t_hier:.2f}x", flush=True)
