import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cProfile, pstats, io
import jax
from nrdsample_tpu.scene import procedural
pr = cProfile.Profile()
pr.enable()
scene = procedural.shader_balls(grid=3, sphere_res=24)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats('cumulative').print_stats(25)
print(s.getvalue(), flush=True)
