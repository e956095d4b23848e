#!/usr/bin/env python
"""Compile the JVM Catalyst extension with javac against the pyspark-shipped
jars and package it as jvmext/graft-ext.jar.

No Scala toolchain exists in this environment; the sources are written so
plain javac suffices (AbstractFunction1 for the Scala interop).  Idempotent:
rebuilds only when a .java is newer than the jar.  Returns the jar path.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src")
JAR = os.path.join(HERE, "graft-ext.jar")


def spark_jars_classpath() -> str:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    needed = (
        "spark-sql_",
        "spark-catalyst_",
        "spark-sql-api_",
        "spark-common-utils_",  # org.apache.spark.internal.Logging
        "spark-unsafe_",  # org.apache.spark.unsafe.types.UTF8String
        "scala-library-",
    )
    paths = [
        os.path.join(jars, f)
        for f in os.listdir(jars)
        if f.startswith(needed) and f.endswith(".jar")
    ]
    if len(paths) < len(needed):
        raise RuntimeError(f"missing spark jars under {jars}")
    return ":".join(sorted(paths))


def build(force: bool = False) -> str:
    sources = glob.glob(os.path.join(SRC, "**", "*.java"), recursive=True)
    if not sources:
        raise RuntimeError(f"no java sources under {SRC}")
    if (
        not force
        and os.path.exists(JAR)
        and all(os.path.getmtime(s) <= os.path.getmtime(JAR) for s in sources)
    ):
        return JAR
    javac = shutil.which("javac")
    jar_tool = shutil.which("jar")
    if javac is None:
        raise RuntimeError("javac not found")
    classes = os.path.join(HERE, "build", "classes")
    shutil.rmtree(classes, ignore_errors=True)
    os.makedirs(classes, exist_ok=True)
    subprocess.run(
        # -encoding pinned: the sources use UTF-8 punctuation in javadoc
        # and javac falls back to the platform locale (US-ASCII in some
        # shells), which turns them into hard compile errors
        [javac, "-encoding", "UTF-8", "-cp", spark_jars_classpath(), "-d", classes, *sources],
        check=True,
    )
    if jar_tool is not None:
        subprocess.run([jar_tool, "cf", JAR, "-C", classes, "."], check=True)
    else:  # the jdk always ships jar alongside javac, but zip is equivalent
        import zipfile

        with zipfile.ZipFile(JAR, "w") as z:
            for root, _, files in os.walk(classes):
                for f in files:
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, classes))
    return JAR


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
