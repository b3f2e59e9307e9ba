package graft.sources

import java.io.File

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And => CatalystAnd, Attribute, EqualTo => CEqualTo, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGte, In => CIn, InSet, LessThan => CLt, LessThanOrEqual => CLte, Literal, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Surgical part-file rewrite for DML on [[FileTable]]s: UPDATE/UPSERT touch
  * only the part files that can contain affected rows, instead of rewriting
  * the whole table (the reference's RMW is per-key for the same reason,
  * backends/datastore/sql_to_datastore.go:218-360).
  *
  * The machinery mirrors `deleteWhere`'s per-file replacement protocol:
  * decode the touched files into a DataFrame (one scan partition per file,
  * each row tagged with its source path), let Catalyst evaluate the DML
  * expressions, then write each file's surviving rows to a `<file>.gupd`
  * temp and rename it over the original on the driver. Untouched part files
  * are never opened — they stay byte-identical, inode and all.
  *
  * At 100 TB this is the difference between a one-row UPDATE costing one
  * file rewrite (KeyRanges sidecar prunes the rest) and costing a full
  * table rewrite. Cross-file atomicity matches `deleteWhere`: each file
  * swap is atomic, the statement as a whole is not transactional (the
  * connector has no transaction log, like the reference's backends).
  */
object PartFileRewrite {

  /** Column carrying each decoded row's source part-file path. */
  val SrcCol = "_gsrc_file"

  /** Translate an already-@-substituted SQL condition into DSv2 filters by
    * analyzing it against the table. Untranslatable conjuncts are dropped,
    * so the resulting list is IMPLIED by the condition — pruning with it
    * keeps a superset of the files that can hold matching rows. */
  def condFilters(spark: SparkSession, tableName: String, cond: String): Seq[Filter] = {
    val plan = spark.table(tableName)
      .filter(org.apache.spark.sql.functions.expr(cond))
      .queryExecution.analyzed
    val conjuncts = plan.collect { case f: logical.Filter => split(f.condition) }.flatten
    conjuncts.flatMap(toFilter)
  }

  /** Like [[condFilters]] but EXACT: None when any conjunct has no
    * filter form. File pruning may drop conjuncts (dropping only widens
    * the candidate set — the full condition re-applies later); a caller
    * that uses the result AS the predicate (the wire-UPDATE path) must
    * not — a dropped conjunct there silently widens the MUTATED set. */
  def condFiltersExact(spark: SparkSession, tableName: String,
      cond: String): Option[Seq[Filter]] = {
    val plan = spark.table(tableName)
      .filter(org.apache.spark.sql.functions.expr(cond))
      .queryExecution.analyzed
    val conjuncts = plan.collect { case f: logical.Filter => split(f.condition) }.flatten
    // the ANALYZED plan wraps literals in casts (id = 2 on a BIGINT
    // column is EqualTo(id, cast(2 as bigint))); fold every foldable
    // subtree to a literal so translation sees the plain shape — using
    // the optimizer instead would also inject inferred IsNotNull
    // conjuncts the caller never wrote
    val folded = conjuncts.map(_.transformUp {
      case e if e.foldable && !e.isInstanceOf[Literal] =>
        Literal.create(e.eval(null), e.dataType)
    })
    val translated = folded.map(toFilter)
    if (folded.isEmpty || translated.exists(_.isEmpty)) None
    else Some(translated.flatten)
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case CatalystAnd(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  /** Catalyst conjunct → v1 source filter, covering exactly the shapes
    * [[KeyPrune]] can use (point, IN, range, prefix on a plain column);
    * everything else drops — conservative, since dropped conjuncts only
    * widen the touched-file set. Literal values convert to their external
    * form, the same representation Spark's own pushdown hands the scan. */
  private def toFilter(e: Expression): Option[Filter] = {
    import org.apache.spark.sql.sources
    def ext(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    e match {
      case CEqualTo(a: Attribute, l: Literal) => Some(sources.EqualTo(a.name, ext(l)))
      case CEqualTo(l: Literal, a: Attribute) => Some(sources.EqualTo(a.name, ext(l)))
      case CIn(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(sources.In(a.name, vs.map(v => ext(v.asInstanceOf[Literal])).toArray))
      case InSet(a: Attribute, vs) =>
        Some(sources.In(a.name, vs.map(v =>
          CatalystTypeConverters.convertToScala(v, a.dataType)).toArray))
      case CGt(a: Attribute, l: Literal) => Some(sources.GreaterThan(a.name, ext(l)))
      case CGt(l: Literal, a: Attribute) => Some(sources.LessThan(a.name, ext(l)))
      case CGte(a: Attribute, l: Literal) => Some(sources.GreaterThanOrEqual(a.name, ext(l)))
      case CGte(l: Literal, a: Attribute) => Some(sources.LessThanOrEqual(a.name, ext(l)))
      case CLt(a: Attribute, l: Literal) => Some(sources.LessThan(a.name, ext(l)))
      case CLt(l: Literal, a: Attribute) => Some(sources.GreaterThan(a.name, ext(l)))
      case CLte(a: Attribute, l: Literal) => Some(sources.LessThanOrEqual(a.name, ext(l)))
      case CLte(l: Literal, a: Attribute) => Some(sources.GreaterThanOrEqual(a.name, ext(l)))
      case StartsWith(a: Attribute, l: Literal) =>
        Option(ext(l)).collect { case p: String => sources.StringStartsWith(a.name, p) }
      case _ => None
    }
  }

  /** Partition the table's part files into (touched, untouched) under the
    * given filters: a file is untouched only when its KeyRanges entry
    * PROVES no matching row can live there. Keyless tables (no sidecar
    * metadata) return everything touched. */
  def touchedFiles(table: FileTable, filters: Seq[Filter]): (Seq[File], Seq[File]) = {
    val files = table.dataFiles()
    val keyField = table.keys.headOption.flatMap(k =>
      table.schema0.fields.find(_.name.equalsIgnoreCase(k)))
    keyField match {
      case Some(f) if filters.nonEmpty =>
        val touched = KeyPrune.prune(files, f.name, f.dataType, table.dir, filters)
        val t = touched.map(_.getPath).toSet
        (touched, files.filterNot(x => t(x.getPath)))
      case _ => (files, Nil)
    }
  }

  /** Decode the given part files into a DataFrame of the table schema plus
    * [[SrcCol]], one scan partition per file. Decoding runs on executors
    * through the table's own codec, so the rewrite round-trips exactly. */
  def readFiles(spark: SparkSession, table: FileTable, files: Seq[File]): DataFrame = {
    val paths = files.map(_.getPath)
    val fmt = table.format
    val schemaJson = table.schema0.json
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .mapPartitions { it =>
        val sch = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val cdc = FileCodec.forFormat(fmt)
        it.flatMap { path =>
          val in = FileCodec.utf8Reader(new File(path))
          val base = cdc.reader(in, sch)
          new Iterator[Row] {
            private var closed = false
            def hasNext: Boolean = {
              if (closed) return false
              val h = base.hasNext
              if (!h) { in.close(); closed = true }
              h
            }
            def next(): Row = Row.fromSeq(base.next().toSeq :+ path)
          }
        }
      }
    spark.createDataFrame(rdd, table.schema0.add(SrcCol, StringType))
  }

  /** Write `df`'s rows back over their source files: each row lands in a
    * `<path>.gupd` temp beside its [[SrcCol]] file, then the driver renames
    * temps over originals and refreshes the KeyRanges sidecar from the
    * rewritten rows. `df` must derive from [[readFiles]] through NARROW
    * operations only (projections, filters, broadcast joins) so rows stay
    * partition-aligned with their file — violated alignment is detected
    * (duplicate per-file results) and aborts before any rename.
    *
    * Touched files that received ZERO output rows are deleted when
    * `removeEmptied` (delete-style rewrites) and left as-is otherwise
    * (update-style rewrites never drop rows, so no output means the file
    * contributed no rows at all). */
  def replaceFiles(
      table: FileTable, df: DataFrame, touched: Seq[File],
      removeEmptied: Boolean): Unit = {
    if (touched.isEmpty) return
    val fmt = table.format
    val schemaJson = table.schema0.json
    val keyIdx = table.keys.headOption
      .map(k => table.schema0.fieldNames.indexWhere(_.equalsIgnoreCase(k)))
      .getOrElse(-1)
    val ordered = df.select(
      table.schema0.fieldNames.map(col).toSeq :+ col(SrcCol): _*)
    val results = ordered.rdd.mapPartitions { rows =>
      val sch = DataType.fromJson(schemaJson).asInstanceOf[StructType]
      val cdc = FileCodec.forFormat(fmt)
      final class St(val out: java.io.BufferedWriter) {
        var keyMin: Any = null
        var keyMax: Any = null
        var rows = 0L
      }
      val open = mutable.LinkedHashMap.empty[String, St]
      rows.foreach { r =>
        val path = r.getString(sch.length)
        val st = open.getOrElseUpdate(path, {
          val w = FileCodec.utf8Writer(new File(path + ".gupd"))
          cdc.writeHeader(w, sch)
          new St(w)
        })
        val arr = Array.tabulate[Any](sch.length)(r.get)
        if (keyIdx >= 0 && arr(keyIdx) != null) {
          val k = arr(keyIdx)
          if (st.keyMin == null || FilterEval.cmp(k, st.keyMin).exists(_ < 0)) st.keyMin = k
          if (st.keyMax == null || FilterEval.cmp(k, st.keyMax).exists(_ > 0)) st.keyMax = k
        }
        st.rows += 1
        cdc.write(st.out, arr, sch)
      }
      open.values.foreach(_.out.close())
      open.iterator.map { case (p, st) =>
        (p, LineCodec.render(st.keyMin), LineCodec.render(st.keyMax), st.rows)
      }.toList.iterator
    }.collect() // one triple per rewritten file: metadata-sized
    val byPath = results.groupBy(_._1)
    require(byPath.values.forall(_.length == 1),
      "part-file rewrite rows crossed partitions (a shuffle broke file " +
        "alignment); aborting before any file is replaced")
    val written = byPath.keySet
    touched.foreach { f =>
      if (written(f.getPath)) {
        val tmp = new File(f.getPath + ".gupd")
        if (!f.delete() || !tmp.renameTo(f))
          throw new IllegalStateException(s"rewrite swap failed for ${f.getPath}")
      } else if (removeEmptied) {
        f.delete()
      }
    }
    // refresh sidecar entries for the rewritten files: new range + count,
    // bucket id carried over (rows stay in their file, so its bucket holds)
    val prior = KeyRanges.load(table.dir)
    KeyRanges.merge(table.dir, results.map { case (p, mn, mx, rows) =>
      val name = new File(p).getName
      name -> FileMeta(mn, mx, rows,
        prior.get(name).map(_.bucket).getOrElse(-1))
    }.toMap)
  }
}
