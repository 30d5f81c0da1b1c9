"""``python -m debias_vision_lang_tpu`` → the CLI (cli.py).

The reference package has no entry point at all (SURVEY.md §1); the longer
``python -m debias_vision_lang_tpu.cli`` form keeps working.
"""

from .cli import main

if __name__ == "__main__":  # don't run argparse on a mere import
    main()
