from .generate_training_commands import (generate_training_commands,
                                         generate_lsf_commands)
from .summarize_benchmark_results import summarize_benchmark_results
