from . import oracle
from .oracle import eval_ranking_oracle, maxskew, ndkl, resolve_topn
from .ranking import desired_distributions, eval_ranking, ranking_metrics
from .distributed import sharded_eval_ranking, sharded_ranking_metrics
