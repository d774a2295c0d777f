"""spark-submit entry script for the scaling-bench pipeline (north rule:
"launched with spark-submit --py-files on multi-executor clusters").

Deliberately contains NO engine code: everything imports from the
``--py-files`` zip (tools/package_pyfiles.py), which is exactly what proves
the artifact is complete — run it from a working directory that does NOT
contain the repo and the job still executes on every executor:

    spark-submit --master local[8] --py-files dist/mtsad_spark.zip \
        tools/submit_launcher.py --cores 8 --input /data/sequences \
        --generate-rows 1000000

Arguments are mtsad_spark.bench_job's (it prints the one-line result JSON).
"""

from mtsad_spark.bench_job import main

if __name__ == "__main__":
    main()
