package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Array/tensor-cell operators over the `embeddings` table — the general
  * form of the reference's per-cell NumPy surface (SURVEY.md §2.8):
  * column-slice projection (P2), positional zip join (J2), elementwise maps
  * (T5/T8), vector norms (T7) and vector-valued scatter-sum (A8).
  *
  * Everything stays inside codegen'd higher-order functions
  * (`transform`/`aggregate`/`posexplode`) — no UDFs, no shuffle except
  * where the semantics require one (a8's group-by). Dot products and norms
  * accumulate in DecimalType so results are bit-reproducible against the
  * sequential oracle regardless of shuffle order (see [[graft.Dec]]).
  */
object ArrayOps extends OpModule {

  val qs: Seq[Q] = Seq(
    // P2 — column-slice projection on a tensor cell (spacepoint [:, :3],
    // view_spacepoint_data.ipynb cell-7).
    Q("p2_array_slice", Some(
      "SELECT vec_id, embedding[1:3] AS emb_head FROM embeddings ORDER BY vec_id"),
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("vec_id"), slice(col("embedding"), 1, 3).as("emb_head"))
        .orderBy("vec_id")),

    // J2 — positional zip join: flatten a tensor cell to long form with
    // explicit positions (zip(trackid, pid, ...) analog,
    // view_spacepoint_data.ipynb cell-5). posexplode preserves positional
    // alignment by construction (SURVEY §7.4).
    Q("j2_zip_join", Some(
      """SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
        |       unnest(embedding) AS val
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id, pos""".stripMargin),
      (s, dir) => Tables(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("col").as("val"))
        .orderBy("vec_id", "pos")),

    // T5/T8 — elementwise arithmetic map over an array cell
    // (pos3d[:,1] -= 117.0 analog, view_voxel_data.ipynb cell-6).
    Q("t5_elementwise", Some(
      """SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) * 2 + 1) AS scaled
        |FROM embeddings ORDER BY vec_id""".stripMargin),
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double") * 2 + 1).as("scaled"))
        .orderBy("vec_id")),

    // T7 — vector norm via a no-shuffle higher-order fold. Both engines
    // run the same left-to-right double fold over the array (DuckDB's
    // list_sum is sequential — verified bit-exact), so no decimal
    // accumulator is needed: the fold never crosses a shuffle.
    Q("t7_vector_norm", Some(
      """SELECT vec_id,
        |  sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin),
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)).as("norm"))
        .orderBy("vec_id")),

    // A8 — vector-valued scatter-sum by key (torch_scatter analog,
    // larennet/larennet.py:61): elementwise sum of embeddings per label.
    // Long-form explode → per-(key,pos) decimal sum → re-assembled in
    // position order. One shuffle, fully partial-aggregated.
    Q("a8_vector_sum", Some(
      """SELECT label, array_agg(sv ORDER BY pos) AS vecsum FROM (
        |  SELECT label, pos, CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,8))) AS DOUBLE) AS sv
        |  FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |               unnest(embedding) AS v FROM embeddings)
        |  GROUP BY label, pos)
        |GROUP BY label ORDER BY label""".stripMargin),
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        // float→double→decimal: DuckDB's direct float→decimal cast scales
        // in float precision and disagrees at the last decimal digit;
        // widening to double first makes both engines round the same
        // binary value.
        .agg(sum(col("col").cast("double").cast(DecimalType(28, 8))).cast("double").as("sv"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
          x => x.getField("sv")).as("vecsum"))
        .orderBy("label"))
  )
}
