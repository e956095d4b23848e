"""``python -m sql_query_optimizer_cpp_spark [sf_dir]`` — interactive REPL
(see :mod:`.repl`; the twin of the reference's ``engine/src/cli.cpp`` loop)."""

from .repl import main

if __name__ == "__main__":
    main()
