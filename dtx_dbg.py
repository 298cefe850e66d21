import os; os.environ["LYRA_TPU_PLATFORM"]="cpu"
import numpy as np
from lyra_tpu.codec.noise_estimator import NoiseEstimator
ne = NoiseEstimator(16000)
st = ne.init_state(1)
rng = np.random.RandomState(7)
flags = []
for t in range(400):
    hop = (rng.uniform(-1,1,320)*1000).astype(np.float32)
    st = ne.receive_hop(st, hop[None])
    flags.append(bool(np.asarray(ne.is_noise(st))[0]))
import itertools
print("first True at:", flags.index(True) if True in flags else None)
print("frac true last 100:", np.mean(flags[-100:]))
# inspect margin
cur_est = np.asarray(st["noise_estimate"])[0]
bound = np.asarray(st["noise_bound"])[0]
print("bound min/max:", bound.min(), bound.max())
